package graft

import graft.cdc.{DeltaLog, IncrementalAgg}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Compaction equivalence: every fold class must see IDENTICAL results
  * on a multi-batch delta log and on its compacted one-batch form.
  */
class DeltaLogSpec extends SparkSpec {
  import spark.implicits._

  private val rowSchema = StructType(Seq(
    StructField("id", LongType), StructField("g", StringType),
    StructField("v", DoubleType)))

  private def row(id: Long, g: String, v: Double) =
    s"""{"id":$id,"g":"$g","v":$v}"""

  test("compact preserves every fold class (± sums, distinct, top-k) and shrinks the log") {
    val base = java.nio.file.Files.createTempDirectory("graft_dl_spec_").toString
    val logDir = s"$base/log"
    def writeBatch(id: Long, rows: Seq[(Long, String, String, String)]): Unit =
      rows.toDF("key", "action", "rowJson", "prevJson")
        .write.mode("overwrite").parquet(s"$logDir/batch_id=$id")
    // batch 0: three inserts across two groups
    writeBatch(0, Seq(
      (1L, "upsert", row(1, "a", 10.0), null),
      (2L, "upsert", row(2, "a", 8.0), null),
      (3L, "upsert", row(3, "b", 6.0), null)))
    // batch 1: re-price k1, group-move k3 b→a, delete k2
    writeBatch(1, Seq(
      (1L, "upsert", row(1, "a", 12.0), row(1, "a", 10.0)),
      (3L, "upsert", row(3, "a", 6.5), row(3, "b", 6.0)),
      (2L, "delete", null, row(2, "a", 8.0))))
    // batch 2: k4 inserted then... nothing (stays live)
    writeBatch(2, Seq((4L, "upsert", row(4, "b", 1.0), null)))

    val original = spark.read.parquet(logDir)
    val compactDir = s"$base/compacted"
    DeltaLog.compact(spark, logDir, compactDir)
    val compacted = spark.read.parquet(compactDir)

    def folds(log: DataFrame) = (
      IncrementalAgg.sumCountByGroup(log, rowSchema, "g", "v")
        .as[(String, Long, Double)].collect().toSet,
      IncrementalAgg.distinctCountByGroup(log, rowSchema, "g", "id")
        .as[(String, Long)].collect().toSet,
      IncrementalAgg.topKByGroup(log, rowSchema, "g", "v", "id", 2)
        .as[(String, Long, Long, Double)].collect().toSet)
    assert(folds(compacted) == folds(original))
    // sanity on the expected live state: k1 a@12, k3 a@6.5, k4 b@1
    assert(folds(compacted)._1 == Set(("a", 2L, 18.5), ("b", 1L, 1.0)))
    // compaction dropped history: one row per LIVE key, prev-free
    val rows = compacted.collect()
    assert(rows.length == 3)
    assert(rows.forall(r => r.getAs[String]("action") == "upsert"
      && r.getAs[String]("prevJson") == null))
  }
}
