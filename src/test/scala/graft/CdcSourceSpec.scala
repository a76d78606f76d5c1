package graft

import graft.cdc.{ChangeFeed, Subscription}
import graft.sinks.EsSink
import graft.sources.cdc._
import graft.streaming.CdcPipeline
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, In}
import org.apache.spark.sql.types._
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** The DSv2 CDC source (graft-cdc): batch + streaming reads, filter
  * pushdown into the scan (R3 source-side pruning), column pruning, and
  * the streaming cursor semantics (restart is a no-op).
  */
class CdcSourceSpec extends SparkSpec {
  import spark.implicits._

  private def cdcScanOf(df: org.apache.spark.sql.DataFrame): CdcScan =
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.head.asInstanceOf[CdcScan]

  test("batch read over the staged feed equals the parquet staging") {
    val feedDir = ChangeFeed.stagedJsonl(spark, sf001)
    val v2 = spark.read.format("graft-cdc").option("path", feedDir).load()
    val parquet = ChangeFeed.staged(spark, sf001)
    assert(v2.count() == parquet.count())
    // same (value, offset) multiset
    val a = v2.select("value", "offset").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
    val b = parquet.select("value", "offset").collect()
      .map(r => (Option(r.getString(0)).orNull, r.getLong(1))).sortBy(_._2)
    assert(a.toSeq == b.toSeq)
  }

  test("subscription filter is pushed into the DSv2 scan and prunes source-side") {
    val feedDir = ChangeFeed.stagedJsonl(spark, sf001)
    val raw = spark.read.format("graft-cdc").option("path", feedDir).load()
    val routed = Subscription(Set("shop"), Set("customer")).route(raw)
    val scan = cdcScanOf(routed)
    assert(scan.filters.exists {
      case EqualTo("src_table", "customer") => true
      case In("src_table", vs) => vs.contains("customer")
      case _ => false
    }, s"expected a src_table filter pushed, got ${scan.filters.mkString(",")}")
    assert(routed.queryExecution.executedPlan.toString.contains("PushedCdcFilters"))
    // semantics unchanged vs post-scan filtering
    val expected = Subscription(Set("shop"), Set("customer"))
      .route(graft.cdc.Envelope.parse(ChangeFeed.staged(spark, sf001))).count()
    assert(routed.count() == expected)
  }

  test("column pruning reaches the source: value/offset-only read") {
    val feedDir = ChangeFeed.stagedJsonl(spark, sf001)
    val df = spark.read.format("graft-cdc").option("path", feedDir).load()
      .select("value", "offset")
    val scan = cdcScanOf(df)
    assert(scan.required.fieldNames.toSet == Set("value", "offset"))
  }

  test("partition reader skips non-matching events during the scan") {
    val dir = Files.createTempDirectory("graft_srcspec_").toFile
    val f = new java.io.File(dir, "part-0000.json")
    val lines = Seq(
      """{"value":"{\"payload\":{\"after\":{\"id\":1},\"source\":{\"db\":\"d\",\"table\":\"keep\"},\"op\":\"c\",\"ts_ms\":1}}","offset":1}""",
      """{"value":"{\"payload\":{\"after\":{\"id\":2},\"source\":{\"db\":\"d\",\"table\":\"drop\"},\"op\":\"c\",\"ts_ms\":2}}","offset":2}""",
      """{"offset":3}""") // tombstone: no routing fields, filtered out
    Files.write(f.toPath, lines.asJava)
    val reader = new CdcPartitionReader(f.getAbsolutePath,
      Array(EqualTo("src_table", "keep")), CdcEventTable.schema)
    var n = 0
    while (reader.next()) {
      val row = reader.get()
      assert(row.getLong(1) == 1L) // only offset 1 survives
      n += 1
    }
    reader.close()
    assert(n == 1)
  }

  test("corrupt wire lines never fail the task: skipped or salvaged, good rows flow") {
    val dir = Files.createTempDirectory("graft_srcbad_").toFile
    val f = new java.io.File(dir, "part-0000.json")
    val lines = Seq(
      // invalid unicode escape — crashed the pre-guard scanner (the
      // literal is split because scalac itself pre-lexes backslash-u)
      """{"value": "\""" + """uZZZZ", "offset": 1}""",
      "not json at all",                      // skipped: not an object
      "[1,2,3]",                              // skipped: not an object
      """{"value":"{\"payload\":{\"op\":\"c\"}}","offset":7}""")
    Files.write(f.toPath, lines.asJava)
    val reader = new CdcPartitionReader(f.getAbsolutePath,
      Array.empty, CdcEventTable.schema)
    var got = List.empty[Long]
    while (reader.next()) { got ::= reader.get().getLong(1) }
    reader.close()
    // the bad-escape line is SALVAGED (escape kept literally), so the
    // record reaches the malformed-envelope classifier downstream as an
    // observable drop instead of killing the streaming query; the
    // structurally non-object lines are skipped (Jackson-path parity)
    assert(got.sorted == List(1L, 7L))
  }

  test("DSv2 streaming pipeline: effects + restart is a no-op") {
    val srcDir = Files.createTempDirectory("graft_v2e2e_src_").toString
    val ckpt = Files.createTempDirectory("graft_v2e2e_ckpt_").toString
    def ev(op: String, id: Long, v: String, ts: Long, off: Long): (String, Long) = {
      val after = if (op == "d") "null" else s"""{"id":$id,"v":"$v"}"""
      (s"""{"payload":{"before":{"id":$id,"v":"x"},"after":$after,""" +
        s""""source":{"db":"d","table":"t","ts_ms":$ts},"op":"$op","ts_ms":$ts}}""", off)
    }
    val wrongTable = ("""{"payload":{"before":null,"after":{"id":9,"v":"n"},""" +
      """"source":{"db":"d","table":"other","ts_ms":1},"op":"c","ts_ms":1}""", 9L)
    Seq(ev("c", 1, "a", 1, 1), ev("u", 1, "b", 2, 2),
      ev("c", 2, "z", 1, 3), ev("d", 2, "-", 9, 4), wrongTable)
      .toDF("value", "offset").coalesce(1).write.mode("overwrite").json(srcDir)

    val pipe = CdcPipeline("v2e2e", Subscription(Set("d"), Set("t")),
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))),
      "id")
    val cfg = EsSink.Config("http://es:9200/idx", "u", "p", "id")
    SinkSpec.recorded.clear()
    val q = pipe.startDsv2(spark, srcDir, ckpt, cfg, new SinkSpec.Recorder)
    q.awaitTermination()
    val reqs = SinkSpec.recorded.asScala.toSeq
    assert(reqs.exists(r => r.method == "DELETE" && r.url.endsWith("/_doc/2")))
    assert(reqs.exists(r => r.method == "PUT" && r.body == """{"id":1,"v":"b"}"""))
    assert(!reqs.exists(_.body.contains("\"id\":9")), "routed-out table leaked")

    SinkSpec.recorded.clear()
    val q2 = pipe.startDsv2(spark, srcDir, ckpt, cfg, new SinkSpec.Recorder)
    q2.awaitTermination()
    assert(SinkSpec.recorded.isEmpty, "checkpoint must prevent re-delivery")
  }
}
