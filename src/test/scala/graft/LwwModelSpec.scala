package graft

import graft.cdc._
import graft.streaming.StatefulLww
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Model-based checks for last-writer-wins: random event sequences
  * (duplicate timestamps, deletes, re-deliveries, shuffled arrival)
  * against a trivial in-memory model, batch and streaming.
  */
class LwwModelSpec extends SparkSpec {
  import spark.implicits._

  private val rowSchema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  case class RawEv(key: Long, op: String, v: String, ts: Long, offset: Long)

  private def genEvents(seed: Long): Seq[RawEv] = {
    val rnd = new scala.util.Random(seed)
    val evs = for {
      key <- 1L to 20L
      n = rnd.nextInt(8)
      i <- 0 until n
    } yield RawEv(key,
      Seq("c", "u", "d", "r")(rnd.nextInt(4)),
      s"v${rnd.nextInt(100)}",
      rnd.nextInt(10).toLong, // deliberately collides — offset tiebreaks
      0L)
    evs.zipWithIndex.map { case (e, i) => e.copy(offset = i.toLong) }
  }

  /** The model: winner per key by (ts, offset); delete winner = absent. */
  private def model(evs: Seq[RawEv]): Map[Long, String] =
    evs.groupBy(_.key).flatMap { case (k, es) =>
      val w = es.maxBy(e => (e.ts, e.offset))
      if (w.op == "d") None else Some(k -> w.v)
    }

  private def toJson(e: RawEv): String = {
    val after = if (e.op == "d") "null" else s"""{"id":${e.key},"v":"${e.v}"}"""
    s"""{"payload":{"before":{"id":${e.key},"v":"x"},"after":$after,""" +
      s""""source":{"db":"d","table":"t","ts_ms":${e.ts}},"op":"${e.op}","ts_ms":${e.ts}}}"""
  }

  test("batch LWW equals the model on random sequences, any arrival order") {
    for (seed <- Seq(7L, 42L, 99L)) {
      val evs = genEvents(seed)
      val shuffled = new scala.util.Random(seed + 1).shuffle(evs)
      val df = shuffled.map(e => (toJson(e), e.offset)).toDF("value", "offset")
      val parsed = EventFilters.all(Envelope.parseTyped(df, rowSchema))
      val key = coalesce(col("after.id"), col("before.id"))
      val got = Materialize.lwwTyped(parsed, key)
        .as[(Long, String)].collect().toMap
      assert(got == model(evs), s"seed $seed")
    }
  }

  test("streaming stateful LWW equals the model across random batch splits") {
    for (seed <- Seq(3L, 11L)) {
      val evs = genEvents(seed)
      val rnd = new scala.util.Random(seed + 2)
      // split the (shuffled) sequence into 4 arbitrary micro-batches
      val shuffled = rnd.shuffle(evs)
      val batches = shuffled.grouped(math.max(1, shuffled.size / 4 + 1)).toSeq

      implicit val ctx = spark.sqlContext
      val mem = MemoryStream[StatefulLww.In]
      val name = s"lww_model_$seed"
      val q = StatefulLww.deltaStream(mem.toDF()
          .withColumnRenamed("tsMs", "ts_ms")
          .withColumnRenamed("rowJson", "after"))
        .writeStream.format("memory").queryName(name).outputMode("append")
        .trigger(Trigger.ProcessingTime(0)).start()
      batches.foreach { b =>
        mem.addData(b.map(e => StatefulLww.In(e.key, e.ts, e.offset, e.op,
          if (e.op == "d") null else s"""{"v":"${e.v}"}""")): _*)
        q.processAllAvailable()
      }
      q.stop()
      // replay the deltas in order: final state per key; each delta's
      // prevJson must equal the state it replaces (the retraction
      // contract IncrementalAgg relies on)
      val deltas = spark.table(name).as[(Long, String, String, String)].collect()
      val state = scala.collection.mutable.Map[Long, String]()
      deltas.foreach {
        case (k, "upsert", json, prev) =>
          assert(state.get(k).orNull == prev, s"seed $seed: bad prev for $k")
          state(k) = json
        case (k, "delete", _, prev) =>
          assert(state.get(k).orNull == prev, s"seed $seed: bad prev for $k")
          state.remove(k)
        case other => fail(s"unexpected delta $other")
      }
      val expected = model(evs).map { case (k, v) => k -> s"""{"v":"$v"}""" }
      assert(state.toMap == expected, s"seed $seed")
    }
  }

  test("incremental aggregate from deltas equals the snapshot aggregate (model-based)") {
    // the q88 arithmetic under random traffic: group/value derived from
    // each event, 2-decimal money grain so the decimal sums are exact
    val aggSchema = StructType(Seq(StructField("id", LongType),
      StructField("g", StringType), StructField("x", DoubleType)))
    def gOf(e: RawEv): String = "g" + (e.v.drop(1).toInt % 3)
    def xOf(e: RawEv): Double = (e.v.drop(1).toInt * 7 + 11) / 100.0
    def rowJson(e: RawEv): String =
      s"""{"id":${e.key},"g":"${gOf(e)}","x":${xOf(e)}}"""
    for (seed <- Seq(5L, 21L)) {
      val evs = genEvents(seed)
      val rnd = new scala.util.Random(seed + 2)
      val batches = rnd.shuffle(evs)
        .grouped(math.max(1, evs.size / 4 + 1)).toSeq
      implicit val ctx = spark.sqlContext
      val mem = MemoryStream[StatefulLww.In]
      val name = s"incr_agg_model_$seed"
      val q = StatefulLww.deltaStream(mem.toDF()
          .withColumnRenamed("tsMs", "ts_ms")
          .withColumnRenamed("rowJson", "after"))
        .writeStream.format("memory").queryName(name).outputMode("append")
        .trigger(Trigger.ProcessingTime(0)).start()
      batches.foreach { b =>
        mem.addData(b.map(e => StatefulLww.In(e.key, e.ts, e.offset, e.op,
          if (e.op == "d") null else rowJson(e))): _*)
        q.processAllAvailable()
      }
      q.stop()
      val got = IncrementalAgg.sumCountByGroup(
        spark.table(name), aggSchema, "g", "x")
        .as[(String, Long, Double)].collect()
        .map { case (g, n, t) => g -> ((n, BigDecimal(t).setScale(2, BigDecimal.RoundingMode.HALF_UP))) }
        .toMap
      val live = evs.groupBy(_.key).flatMap { case (_, es) =>
        val w = es.maxBy(e => (e.ts, e.offset))
        if (w.op == "d") None else Some(w)
      }.toSeq
      val exp = live.groupBy(gOf).map { case (g, ws) =>
        g -> ((ws.size.toLong,
          ws.map(w => BigDecimal(xOf(w)).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum))
      }
      assert(got == exp, s"seed $seed")
      // the NON-additive view over the same delta history: per-group
      // distinct value count via support refcounts must equal the
      // distinct count over the live snapshot rows
      val gotDistinct = IncrementalAgg.distinctCountByGroup(
        spark.table(name), aggSchema, "g", "x")
        .as[(String, Long)].collect().toMap
      val expDistinct = live.groupBy(gOf).map { case (g, ws) =>
        g -> ws.map(xOf).distinct.size.toLong
      }
      assert(gotDistinct == expDistinct, s"seed $seed (distinct)")
      // min/max over the same support table: deleting an extremum must
      // surface the runner-up (the random traffic includes deletes of
      // every kind of row, so this exercises exactly that)
      val gotMinMax = IncrementalAgg.minMaxByGroup(
        spark.table(name), aggSchema, "g", "x")
        .as[(String, Double, Double)].collect()
        .map { case (g, mn, mx) => g -> ((mn, mx)) }.toMap
      val expMinMax = live.groupBy(gOf).map { case (g, ws) =>
        g -> ((ws.map(xOf).min, ws.map(xOf).max))
      }
      assert(gotMinMax == expMinMax, s"seed $seed (minmax)")
    }
  }
}
