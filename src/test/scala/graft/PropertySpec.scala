package graft

import graft.cdc.{Envelope, EventFilters}
import graft.ops.{Dedup, Shingles}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property-based invariants (SURVEY §5.2): parser totality on arbitrary
  * junk (scalacheck generators), dedup idempotence, Jaccard bounds.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("envelope parse + filters are total on arbitrary strings (no throw, junk dropped)") {
    val junkGen = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.const(null: String),
      Gen.const(""),
      Gen.const("{"),
      Gen.const("[1,2,3]"),
      Gen.const("""{"payload": 7}"""),
      Gen.const("""{"payload": {"op": []}}"""),
      Gen.asciiPrintableStr)
    val samples = Gen.listOfN(200, junkGen).sample.get
    val df = samples.zipWithIndex.map { case (s, i) => (s, i.toLong) }
      .toDF("value", "offset")
    // must not throw; nothing junk-shaped survives the filter chain
    val kept = EventFilters.all(Envelope.parse(df)).collect()
    assert(kept.isEmpty)
  }

  test("dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    val docs = Tables.documents(spark, sf001)
    val once = Dedup.keepMinBy(docs, Seq("lang"), col("doc_id"))
    val twice = Dedup.keepMinBy(once, Seq("lang"), col("doc_id"))
    assert(once.except(twice).isEmpty && twice.except(once).isEmpty)
  }

  test("jaccard is bounded in [0,1], pairs ordered, self-pairs absent") {
    val sh = Shingles.tokenShingles(Tables.documents(spark, sf001), "doc_id", "text", 3)
    val pairs = Shingles.jaccardPairs(sh, 0.0)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, j) =>
      assert(a < b && j >= 0.0 && j <= 1.0, s"($a,$b,$j)")
    }
  }

  test("identical texts have jaccard exactly 1.0") {
    val df = Seq((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "x y z w q r"))
      .toDF("doc_id", "text")
    val pairs = Shingles.jaccardPairs(
      Shingles.tokenShingles(df, "doc_id", "text", 3), 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 1.0)))
  }
}
