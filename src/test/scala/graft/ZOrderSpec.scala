package graft

import graft.ops.ZOrder
import org.apache.spark.sql.functions._

/** Z-order layout: multi-dimensional clustering so a 2-d box predicate
  * prunes whole partitions instead of scanning the table.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits; bucketRange bounds cover every box row") {
    // bit-level ground truth on a small exhaustive grid
    val zs = for (x <- 0 until 16; y <- 0 until 16) yield {
      val z = Seq((x, 15, 0), (y, 15, 1)).map { case (v, _, off) =>
        (0 until 4).map(i => ((v >> i) & 1).toLong << (2 * i + off)).sum
      }.sum
      ((x, y), z)
    }
    val df = zs.map { case ((x, y), _) => (x, y) }.toDF("x", "y")
    val got = df.select(col("x"), col("y"),
      ZOrder.zValue(col("x"), col("y"), 4).as("z"))
      .as[(Int, Int, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    zs.foreach { case (xy, z) => assert(got(xy) === z, s"at $xy") }
    // every z of the box [4,7]x[2,5] lies inside bucketRange's bounds
    val (lo, hi) = ZOrder.bucketRange(4, 7, 2, 5, 4, 16)
    val shift = 2 * 4 - 4
    zs.filter { case ((x, y), _) => x >= 4 && x <= 7 && y >= 2 && y <= 5 }
      .foreach { case (xy, z) =>
        assert((z >> shift) >= lo && (z >> shift) <= hi, s"bucket miss at $xy")
      }
  }

  test("z-ordered layout prunes partitions for a 2-d box scan") {
    val ev = Tables.events(spark, sf001)
    val bits = 4
    val q = ev.select(col("event_id"), col("user_id"), col("value"),
      ZOrder.quantize(col("user_id"), 0, 50, bits).as("qx"),
      ZOrder.quantize(col("value"), 0, 1000, bits).as("qy"))
    val path = java.nio.file.Files.createTempDirectory("graft_zorder_").toString
    ZOrder.writeZOrdered(q, "qx", "qy", bits, 16, path)

    val laid = spark.read.parquet(path)
    val (lo, hi) = ZOrder.bucketRange(0, 3, 0, 3, bits, 16)
    val pruned = laid
      .filter(col("z_bucket") >= lo && col("z_bucket") <= hi)
      .filter(col("qx").between(0, 3) && col("qy").between(0, 3))
    val naive = q.filter(col("qx").between(0, 3) && col("qy").between(0, 3))

    // correctness: the pruned scan returns exactly the box rows
    assert(pruned.select("event_id").except(naive.select("event_id")).isEmpty)
    assert(naive.select("event_id").except(pruned.select("event_id")).isEmpty)

    // pruning: the z_bucket range reaches the scan as a partition filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("z_bucket"),
      s"z_bucket range must prune partitions:\n$plan")
    assert(hi - lo + 1 < 16, "box should map to a strict subset of buckets")
  }
}
