package graft

import graft.ops.Joins
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join row-for-row on a skewed key") {
    // 90% of events hit one user — the classic hot key
    val skewed = Tables.events(spark, sf001)
      .withColumn("user_id", when(col("event_id") % 10 =!= 0, 7L).otherwise(col("user_id")))
      .select("event_id", "user_id", "value")
    val dim = Tables.events(spark, sf001)
      .select(col("user_id")).distinct()
      .withColumn("segment", concat(lit("seg"), col("user_id") % 5))
    val plain = skewed.join(dim, Seq("user_id"))
      .select("event_id", "user_id", "segment")
    val salted = Joins.saltedJoin(skewed, dim, Seq("user_id"), 8)
      .select("event_id", "user_id", "segment")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  private def ts(m: Long) = new Timestamp(m * 60000L)

  test("asofJoin picks the latest right row at-or-before each left ts, per key") {
    val quotes = Seq( // key, ts, px
      (1L, ts(0), 10.0), (1L, ts(10), 11.0), (1L, ts(20), 12.0),
      (2L, ts(5), 20.0))
      .toDF("key", "ts", "px")
    val trades = Seq(
      (1L, ts(5), "t1"),   // -> px 10 (quote at 0)
      (1L, ts(10), "t2"),  // -> px 11 (tie: quote at same ts wins)
      (1L, ts(99), "t3"),  // -> px 12 (latest)
      (2L, ts(0), "t4"),   // -> no quote yet: null
      (3L, ts(1), "t5"))   // -> key never quoted: null
      .toDF("key", "ts", "trade")
    val joined = Joins.asofJoin(trades, quotes, "key", "ts")
      .select(col("trade"), col("right.px").as("px"))
      .as[(String, Option[Double])].collect().toMap
    assert(joined == Map(
      "t1" -> Some(10.0), "t2" -> Some(11.0), "t3" -> Some(12.0),
      "t4" -> None, "t5" -> None))
  }

  test("rangeJoin equals the naive range predicate, as an equijoin plan") {
    val ev = Tables.events(spark, sf001)
      .select(col("user_id"), col("ts"), col("event_id"))
    val w = 4 * 3600L
    val naive = ev.as("a").join(ev.as("b"),
        col("a.user_id") === col("b.user_id")
          && col("b.ts") > col("a.ts")
          && col("b.ts") <= col("a.ts") + expr(s"INTERVAL $w SECONDS"))
      .select(col("a.event_id").as("l"), col("b.event_id").as("r"))
    val binned = Joins.rangeJoin(ev, ev, "user_id", "ts", w)
      .select(col("l_event_id").as("l"), col("r_event_id").as("r"))
    assert(binned.count() == naive.count())
    assert(binned.except(naive).isEmpty && naive.except(binned).isEmpty)
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "range join must stay an equijoin on (key, bin)")
  }

  test("rangeJoin boundary semantics: strictly-after start, inclusive end") {
    val rows = Seq((1L, ts(0), "a"), (1L, ts(60), "b"), (1L, ts(61), "c"))
      .toDF("k", "ts", "tag")
    val pairs = Joins.rangeJoin(rows, rows, "k", "ts", windowSec = 3600)
      .select(col("l_tag"), col("r_tag")).as[(String, String)].collect().toSet
    // a->b at exactly +3600s included; a->c at +3660s excluded; b->c included
    assert(pairs == Set(("a", "b"), ("b", "c")))
  }

  test("asofJoin plans as one shuffle, not a range cross-join") {
    val quotes = Tables.events(spark, sf001)
      .select(col("user_id").as("key"), col("ts"), col("value"))
    val trades = Tables.events(spark, sf001)
      .select(col("user_id").as("key"), col("ts"), col("event_id"))
    val plan = Joins.asofJoin(trades, quotes, "key", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "as-of must not expand to a range product")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length <= 1,
      "as-of should shuffle once on the key")
  }

  test("intervalJoin: exactly-once per overlapping pair, half-open boundaries, equijoin plan") {
    import java.sql.Timestamp
    def t(min: Long) = new Timestamp(min * 60000L)
    // key 1: [0,120) vs [60,180)  -> overlap (spans multiple 30-min bins: no dup)
    //        [0,120) vs [120,180) -> touching, half-open: NO match
    //        [0,120) vs [30,60)   -> contained: match
    // key 2: [0,60)  vs key-1 rows: key mismatch
    val left = Seq((1L, 10L, t(0), t(120)), (2L, 11L, t(0), t(60)))
      .toDF("k", "id", "s", "e")
    val right = Seq((1L, 20L, t(60), t(180)), (1L, 21L, t(120), t(180)),
      (1L, 22L, t(30), t(60)))
      .toDF("k", "id", "s", "e")
    val out = Joins.intervalJoin(left, right, "k", "s", "e", binSec = 1800)
      .select(col("l_id"), col("r_id")).as[(Long, Long)].collect().toSeq
    assert(out.sorted == Seq((10L, 20L), (10L, 22L)),
      s"expected exactly-once overlap pairs, got $out")
    val plan = Joins.intervalJoin(left, right, "k", "s", "e", binSec = 1800)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "interval join must stay an equijoin")
  }
}
