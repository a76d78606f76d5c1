package graft

import graft.ops._
import org.apache.spark.sql.functions._

/** Near-dup operators: the scaled paths (MinHash-LSH, SimHash) pinned
  * against the exact shingle-Jaccard formulation; dedup determinism.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf001)

  private lazy val exactPairs =
    Shingles.jaccardPairs(Shingles.tokenShingles(docs, "doc_id", "text", 3), 0.6)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet

  test("exact jaccard finds the injected near-dup pairs, none below threshold") {
    assert(exactPairs.nonEmpty)
    val all = Shingles.jaccardPairs(
      Shingles.tokenShingles(docs, "doc_id", "text", 3), 0.0)
      .as[(Long, Long, Double)].collect()
    all.foreach { case (_, _, j) => assert(j >= 0.0 && j <= 1.0) }
    // clear separation: everything kept is far above, everything else far below
    assert(all.filter(_._3 >= 0.6).forall(_._3 >= 0.85))
    assert(all.filter(_._3 < 0.6).forall(_._3 <= 0.3))
  }

  test("MinHash-LSH banding + exact verify reproduces the exact pair set") {
    val lsh = MinHashLsh.nearDupPairs(docs, "doc_id", "text", 3, 0.6)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    assert(lsh == exactPairs)
  }

  test("char-gram MinHash banding reproduces the exact char-jaccard pair set") {
    // tokenizer-free path: charShingles feed the SAME banding machinery;
    // denser char-gram background (~0.2-0.3 jac) → 12 bands × 6 rows
    val sh = Shingles.charShingles(docs, "doc_id", "text", 5)
    val exact = Shingles.jaccardPairs(sh, 0.5)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    val banded = MinHashLsh.nearDupPairsFromShingles(sh, 0.5, bands = 12, rows = 6)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(banded == exact)
  }

  test("bandedRows (map-only) carries the same shingle sets and signatures as docState") {
    val docs = Tables.documents(spark, sf001).limit(50)
    // shingle sets: per-row HOF form == exploded-aggregate form
    val fromRows = MinHashLsh.bandedRows(docs, "doc_id", "text")
      .select(col("id"), col("ss")).distinct()
      .select(col("id"), array_sort(col("ss")).as("ss"))
      .as[(Long, Seq[String])].collect().toMap
    val fromAgg = MinHashLsh.docState(
      Shingles.tokenShingles(docs, "doc_id", "text", 3))
      .select(col("id"), array_sort(col("ss")).as("ss"))
      .as[(Long, Seq[String])].collect().toMap
    assert(fromRows == fromAgg)
    // the per-row plan is map-only: no Exchange anywhere (checked on
    // the bare scan — the fixture's limit above would add its own),
    // and the expensive shingle-set expression evaluates ONCE per row
    // (a size(_ss) filter once inlined it into scan + Filter + Project)
    val plan = MinHashLsh.bandedRows(
      Tables.documents(spark, sf001), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "bandedRows must not shuffle")
    assert("array_distinct".r.findAllIn(plan).length == 1,
      "shingle-set construction must appear exactly once in the plan")
  }

  test("nearDupAgainstCorpus flags exactly the incoming docs with an exact cross match") {
    val docs = Tables.documents(spark, sf001)
    val hist = docs.filter(col("doc_id") % 2 === 0)
    val inc = docs.filter(col("doc_id") % 2 === 1)
    val got = MinHashLsh.nearDupAgainstCorpus(hist, inc, "doc_id", "text")
      .as[Long].collect().toSet
    // exact cross-half ground truth from the exact pair formulation
    val exact = Shingles.jaccardPairs(
      Shingles.tokenShingles(docs, "doc_id", "text", 3), 0.6)
      .filter((col("doc_id_a") % 2 === 0 && col("doc_id_b") % 2 === 1) ||
        (col("doc_id_a") % 2 === 1 && col("doc_id_b") % 2 === 0))
      .select(when(col("doc_id_a") % 2 === 1, col("doc_id_a"))
        .otherwise(col("doc_id_b")).as("d"))
      .as[Long].collect().toSet
    assert(got == exact)
    assert(exact.nonEmpty, "fixture should contain cross-half near-dups")
  }

  test("SimHash hamming tracks jaccard: high recall at <=7, near-dups at low hamming") {
    val sim = SimHash.nearDupPairs(docs, "doc_id", "text", 7)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    // recall: near-dups at jaccard ~0.9 land at hamming 0..9
    val recall = (exactPairs intersect sim).size.toDouble / exactPairs.size
    assert(recall >= 0.8, s"simhash recall $recall")
    // correlation: the tightest near-dups (jaccard >= 0.97) must sit at
    // very low hamming. (No precision bound: this corpus shares one
    // small vocabulary, so moderately-similar bags-of-words legitimately
    // land at moderate hamming too.)
    val sigs = graft.ops.SimHash.signatures(docs, "doc_id", "text")
    val tight = Shingles.jaccardPairs(
      Shingles.tokenShingles(docs, "doc_id", "text", 3), 0.97)
    val hams = tight
      .join(sigs.withColumnRenamed("id", "doc_id_a")
        .withColumnRenamed("simhash", "ha"), "doc_id_a")
      .join(sigs.withColumnRenamed("id", "doc_id_b")
        .withColumnRenamed("simhash", "hb"), "doc_id_b")
      .select(bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .as[Long].collect()
    assert(hams.nonEmpty && hams.forall(_ <= 7), s"hamming of 0.97-jaccard pairs: ${hams.toSeq}")
  }

  test("winnowing guarantee: docs sharing a run >= w+k-1 tokens share a fingerprint") {
    // k=5, w=4: any common substring of >= 8 tokens must yield at least
    // one common selected fingerprint (the winnowing theorem); disjoint
    // vocabularies must share none
    val shared = (0 until 12).map(i => s"common$i").mkString(" ")
    val df = Seq(
      (1L, s"alpha beta gamma $shared delta epsilon zeta eta theta"),
      (2L, s"one two three four five $shared six seven eight nine"),
      (3L, "wholly unrelated words only here kept long enough for windows"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.winnow(df, "doc_id", "text", 5, 4)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert((fps(1L) intersect fps(2L)).nonEmpty,
      "shared 12-token run must produce a shared fingerprint")
    assert((fps(1L) intersect fps(3L)).isEmpty && (fps(2L) intersect fps(3L)).isEmpty,
      "disjoint vocabulary must share no fingerprints")
  }

  test("keepMinBy keeps exactly the min-ord row per key, idempotently") {
    val deduped = Dedup.keepMinBy(docs, Seq("lang", "source"), col("doc_id"))
    val expected = docs.groupBy("lang", "source").agg(min("doc_id").as("doc_id"))
    assert(deduped.select("lang", "source", "doc_id").except(expected).isEmpty)
    assert(expected.except(deduped.select("lang", "source", "doc_id")).isEmpty)
    val again = Dedup.keepMinBy(deduped, Seq("lang", "source"), col("doc_id"))
    assert(again.count() == deduped.count())
  }
}
