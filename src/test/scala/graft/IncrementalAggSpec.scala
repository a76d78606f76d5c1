package graft

import graft.cdc.IncrementalAgg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Retraction semantics of the incrementally-maintained top-k: deleting
  * or re-pricing a reigning maximum must surface the correct runner-up
  * from the delta history alone — no snapshot re-scan.
  */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val rowSchema = StructType(Seq(
    StructField("id", LongType), StructField("g", StringType),
    StructField("v", DoubleType)))

  private def row(id: Long, g: String, v: Double) =
    s"""{"id":$id,"g":"$g","v":$v}"""

  private def deltas(rows: (Long, String, String, String)*): DataFrame =
    rows.toDF("key", "action", "rowJson", "prevJson")

  private def topk(d: DataFrame, k: Int): Seq[(String, Long, Long, Double)] =
    IncrementalAgg.topKByGroup(d, rowSchema, "g", "v", "id", k)
      .as[(String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq

  test("delete of the reigning max surfaces the runner-up; update re-ranks") {
    val b1 = deltas(
      (1L, "upsert", row(1, "a", 10.0), null),
      (2L, "upsert", row(2, "a", 8.0), null),
      (3L, "upsert", row(3, "a", 6.0), null),
      (4L, "upsert", row(4, "a", 4.0), null))
    assert(topk(b1, 2) == Seq(("a", 1L, 1L, 10.0), ("a", 2L, 2L, 8.0)))

    // the reigning max (id 1) is DELETED — its +row cancels, the
    // runner-up (id 2) takes rank 1 with no history replay
    val b2 = b1.unionByName(deltas((1L, "delete", null, row(1, "a", 10.0))))
    assert(topk(b2, 2) == Seq(("a", 1L, 2L, 8.0), ("a", 2L, 3L, 6.0)))

    // an UPDATE re-prices id 3 past everyone: +new/−prev swap its
    // support row and the ranking follows
    val b3 = b2.unionByName(deltas(
      (3L, "upsert", row(3, "a", 12.0), row(3, "a", 6.0))))
    assert(topk(b3, 2) == Seq(("a", 1L, 3L, 12.0), ("a", 2L, 2L, 8.0)))
  }

  test("equal values retract independently (row identity is part of the support key)") {
    val d = deltas(
      (1L, "upsert", row(1, "a", 5.0), null),
      (2L, "upsert", row(2, "a", 5.0), null),
      (1L, "delete", null, row(1, "a", 5.0)))
    // deleting id 1 must not take id 2's equal-valued row with it
    assert(topk(d, 2) == Seq(("a", 1L, 2L, 5.0)))
  }

  test("rank<=k is planned as WindowGroupLimit (partition-local top-k before the shuffle)") {
    val d = deltas((1L, "upsert", row(1, "a", 1.0), null))
    val p = IncrementalAgg.topKByGroup(d, rowSchema, "g", "v", "id", 10)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
  }
}
