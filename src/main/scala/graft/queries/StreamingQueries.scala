package graft.queries

import graft.QueryDef
import graft.ops.MinHashLsh
import graft.streaming.Replay
import graft.Tables
import org.apache.spark.sql.functions._

/** Structured Streaming surface (SURVEY Q23–Q25): event-time windows
  * with watermarks, session windows, and streaming dedup, each replayed
  * from the events table and checked against a DuckDB batch oracle over
  * the same rows.
  *
  * Window starts are epoch-aligned in both engines (Spark `window()`
  * aligns to the unix epoch; the oracle buckets with epoch arithmetic),
  * and money sums go through DECIMAL as everywhere else.
  */
object StreamingQueries {

  /** Q23: 5-minute tumbling count/sum by event_type under a 10-minute
    * watermark.
    */
  val q23 = QueryDef.sql(
    "q23_stream_tumbling",
    """SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS bucket_s,
      |       event_type, count(*) AS cnt,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    val agg = Replay.eventsStream(spark, dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    Replay.runToResult(spark, agg)
      .select(col("window.start").cast("long").as("bucket_s"),
        col("event_type"), col("cnt"), col("sum_value"))
  }

  /** Q24a: sliding windows (10 min length, 5 min slide) — every event
    * lands in exactly two buckets.
    */
  val q24a = QueryDef.sql(
    "q24a_stream_sliding",
    """SELECT CAST(b AS BIGINT) AS bucket_s, event_type,
      |       count(*) AS cnt,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM (SELECT unnest([floor(epoch(ts) / 300) * 300 - 300,
      |                     floor(epoch(ts) / 300) * 300]) AS b,
      |             event_type, value
      |      FROM events)
      |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    val agg = Replay.eventsStream(spark, dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    Replay.runToResult(spark, agg)
      .select(col("window.start").cast("long").as("bucket_s"),
        col("event_type"), col("cnt"), col("sum_value"))
  }

  /** Q24b: session windows, 30-minute gap, per user. Spark MERGES events
    * whose gap equals the timeout exactly (verified empirically: events
    * at t and t+30min land in one session), so the gaps-and-islands
    * oracle breaks on `diff > 30 minutes`, strictly greater.
    */
  val q24b = QueryDef.sql(
    "q24b_stream_session",
    """WITH x AS (
      |  SELECT user_id, ts, event_id, value,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
      |              THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |y AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                               ROWS UNBOUNDED PRECEDING) AS grp
      |      FROM x)
      |SELECT user_id,
      |       CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_s,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM y GROUP BY user_id, grp""".stripMargin) { (spark, dir) =>
    val agg = Replay.eventsStream(spark, dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    Replay.runToResult(spark, agg)
      .select(col("user_id"),
        col("session_window.start").cast("long").as("session_start_s"),
        col("n_events"), col("sum_value"))
  }

  /** Q25: streaming dedup — the replay injects a duplicate delivery of
    * every 100th event; `dropDuplicates` on the id under the watermark
    * must restore exactly the original event set.
    */
  val q25 = QueryDef.sql(
    "q25_stream_dedup",
    """SELECT event_type, count(*) AS cnt,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY event_type""".stripMargin) { (spark, dir) =>
    val deduped = Replay.eventsStream(spark, dir, withDuplicates = true)
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    Replay.runToResult(spark, deduped)
      .select(col("event_type"), col("cnt"), col("sum_value"))
  }

  /** Q39: stream-stream inner join with a time-range condition —
    * purchases followed by an error within 1 hour, per user. Both sides
    * carry watermarks (bounding join state retention in a continuous
    * run: a purchase can be dropped from state once the error-side
    * watermark passes its upper bound); with AvailableNow over one
    * staged file, every match emits in the single batch and the result
    * equals the batch join the oracle states.
    */
  val q39 = QueryDef.sql(
    "q39_stream_stream_join",
    """SELECT p.user_id, p.event_id AS buy_event, e.event_id AS err_event,
      |       CAST(date_diff('microsecond', p.ts, e.ts) AS BIGINT) AS gap_us
      |FROM events p JOIN events e
      |  ON p.user_id = e.user_id
      | AND p.event_type = 'purchase' AND e.event_type = 'error'
      | AND e.ts > p.ts AND e.ts <= p.ts + INTERVAL 1 HOUR""".stripMargin) { (spark, dir) =>
    val buys = Replay.eventsStream(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("buy_event"))
      .withWatermark("p_ts", "10 minutes")
    val errs = Replay.eventsStream(spark, dir)
      .filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"),
        col("event_id").as("err_event"))
      .withWatermark("e_ts", "10 minutes")
    val joined = buys.join(errs,
      col("user_id") === col("e_user")
        && col("e_ts") > col("p_ts")
        && col("e_ts") <= col("p_ts") + expr("INTERVAL 1 HOUR"))
    Replay.runToResultAppend(spark, joined)
      .select(col("user_id"), col("buy_event"), col("err_event"),
        (unix_micros(col("e_ts")) - unix_micros(col("p_ts"))).as("gap_us"))
  }

  /** Q97: stream-stream LEFT OUTER join — q39's pattern plus the null
    * rows for purchases with NO error within the hour. The nulls are
    * eviction-driven output: Spark emits an unmatched left row only
    * when the watermark passes its state-eviction time, and real
    * traffic never pushes the watermark past its own tail — so the
    * replay stages a far-future flush sentinel on BOTH input types
    * (the join watermark is the min of the two sides) and keeps the
    * trailing no-data batch (runToResultAppendEvicting). Sentinel rows
    * (user_id < 0) are filtered back out; the result then equals the
    * batch LEFT JOIN the oracle states.
    */
  val q97 = QueryDef.sql(
    "q97_stream_stream_outer",
    """SELECT p.user_id, p.event_id AS buy_event, e.event_id AS err_event,
      |       CAST(date_diff('microsecond', p.ts, e.ts) AS BIGINT) AS gap_us
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      |  ON p.user_id = e.user_id
      | AND e.ts > p.ts AND e.ts <= p.ts + INTERVAL 1 HOUR""".stripMargin) { (spark, dir) =>
    val src = Replay.eventsStreamWithFlush(spark, dir, Seq("purchase", "error"))
    val buys = src.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("buy_event"))
      .withWatermark("p_ts", "10 minutes")
    val errs = src.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"),
        col("event_id").as("err_event"))
      .withWatermark("e_ts", "10 minutes")
    val joined = buys.join(errs,
      col("user_id") === col("e_user")
        && col("e_ts") > col("p_ts")
        && col("e_ts") <= col("p_ts") + expr("INTERVAL 1 HOUR"),
      "left_outer")
    Replay.runToResultAppendEvicting(spark, joined)
      .filter(col("user_id") >= 0)
      .select(col("user_id"), col("buy_event"), col("err_event"),
        (unix_micros(col("e_ts")) - unix_micros(col("p_ts"))).as("gap_us"))
  }

  /** Q100: CHAINED streaming window aggregations (two stateful
    * operators in one query — Spark's multi-stateful-operator support):
    * 5-minute counts per event type re-windowed into hourly peak-rate
    * rows (max 5-min count + bucket count per hour). The first
    * aggregate only emits a finalized 5-minute window downstream once
    * the watermark passes it, and the second only emits an hour once
    * the PROPAGATED (operator-local) watermark passes that — so the
    * replay uses the q97 machinery: a flush sentinel of a type that
    * exists nowhere in the data ('flush', filtered back out) plus the
    * trailing no-data batch.
    */
  val q100 = QueryDef.sql(
    "q100_stream_chained_windows",
    """WITH b5 AS (SELECT event_type,
      |              CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS w5_s,
      |              count(*) AS c5
      |            FROM events GROUP BY 1, 2)
      |SELECT event_type,
      |       CAST(w5_s // 3600 * 3600 AS BIGINT) AS hour_start_s,
      |       max(c5) AS peak_5min,
      |       count(*) AS n_buckets
      |FROM b5 GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    val src = Replay.eventsStreamWithFlush(spark, dir, Seq("flush"))
    val five = src.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("c5"))
    val hourly = five
      .groupBy(window(col("window"), "1 hour"), col("event_type"))
      .agg(max(col("c5")).as("peak_5min"), count(lit(1)).as("n_buckets"))
    Replay.runToResultAppendEvicting(spark, hourly)
      .filter(col("event_type") =!= "flush")
      .select(col("event_type"),
        col("window.start").cast("long").as("hour_start_s"),
        col("peak_5min"), col("n_buckets"))
  }

  /** Q56: stream-STATIC join — the enrichment pattern (a stream joined
    * to a broadcast dimension rebuilt per micro-batch, no join state at
    * all, unlike q39's watermarked stream-stream state). The dimension
    * here is per-user segments derived from customer; events enrich
    * against it and aggregate per segment under the stream's watermark.
    */
  val q56 = QueryDef.sql(
    "q56_stream_static_join",
    """SELECT concat('seg', CAST(c_custkey % 7 AS VARCHAR)) AS segment,
      |       count(*) AS cnt,
      |       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY 1""".stripMargin) { (spark, dir) =>
    val dim = graft.Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"),
        concat(lit("seg"), (col("c_custkey") % 7).cast("string")).as("segment"))
    val agg = Replay.eventsStream(spark, dir)
      .withWatermark("ts", "10 minutes")
      .join(broadcast(dim), Seq("user_id"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("cnt"),
        (graft.ops.FixedPoint.sumFixed(col("value"), 100) / 100.0).as("sum_value"))
    Replay.runToResult(spark, agg)
      .select(col("segment"), col("cnt"), col("sum_value"))
  }

  /** Q71: streaming corpus curation — the q68 quality gate applied to
    * documents arriving as a STREAM (continuous-ingest curation), with a
    * per-reason running account. The gate itself is the same map-only
    * operator (TextAnalysis.qualityFilter composes unchanged over
    * readStream — the batch/stream unification the Dataset API
    * promises); the aggregate is the only stateful stage.
    */
  val q71 = QueryDef.sql(
    "q71_stream_quality_gate",
    """WITH t AS (SELECT doc_id,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
      |       FROM documents)
      |SELECT CASE WHEN n_tok < 25 THEN 'too_short'
      |            WHEN n_distinct * 100 < n_tok * 30 THEN 'repetitive'
      |            ELSE 'ok' END AS reason,
      |       count(*) AS n_docs,
      |       CAST(sum(n_tok) AS BIGINT) AS tot_tokens
      |FROM t GROUP BY 1""".stripMargin) { (spark, dir) =>
    val gated = graft.ops.TextAnalysis.qualityFilter(
      Replay.documentsStream(spark, dir), "text", 25, 30)
    val agg = gated.groupBy(col("reason"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tot_tokens"))
    Replay.runToResult(spark, agg)
      .select(col("reason"), col("n_docs"), col("tot_tokens"))
  }

  /** Q85: the schema-drift monitor as a STREAMING query — the
    * observed-fields aggregate runs incrementally inside the streaming
    * query over the DSv2 wire source (complete mode: the report is a
    * monotone count snapshot per micro-batch), and the declared-set
    * diff applies to the result. Same oracle as batch q82 — the
    * batch/streaming parity proof for the drift monitor.
    */
  val q85 = QueryDef.sql(
    "q85_stream_schema_drift", CdcQueries.driftOracle) { (spark, dir) =>
    val feedDir = graft.cdc.ChangeFeed.stagedJsonl(spark, dir)
    val raw = spark.readStream.format("graft-cdc").option("path", feedDir).load()
    val observed = Replay.runToResult(spark,
      graft.cdc.SchemaDrift.observedFields(raw))
    graft.cdc.SchemaDrift.driftOf(spark, observed, CdcQueries.driftDeclared)
  }

  /** Q86: exact top-3 event values per tumbling window through the
    * bounded typed Aggregator (functions.TopKAgg) running INSIDE the
    * streaming aggregate — the UDAF's buffer serializes through the
    * state store between micro-batches, so the k·windows state shape
    * (not every row) is what streams carry. Same result as the
    * per-window row_number the oracle states; value grain makes ranks
    * engine-stable (q79's argument, per bucket).
    */
  val q86 = QueryDef.sql(
    "q86_stream_window_topk",
    """SELECT bucket_s, rnk, v FROM (
      |  SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS bucket_s,
      |         value AS v,
      |         row_number() OVER (PARTITION BY floor(epoch(ts) / 300)
      |                            ORDER BY value DESC) AS rnk
      |  FROM events) WHERE rnk <= 3""".stripMargin) { (spark, dir) =>
    val topk = udaf(new graft.functions.TopKAgg(3))
    val agg = Replay.eventsStream(spark, dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(topk(col("value")).as("vs"))
    Replay.runToResult(spark, agg)
      .select(col("window.start").cast("long").as("bucket_s"),
        posexplode(col("vs")))
      .select(col("bucket_s"), (col("pos") + 1).cast("long").as("rnk"),
        col("col").as("v"))
  }

  /** Q87: ONLINE dedup — incoming documents (a stream) checked against
    * a static historical corpus via the map-only banded-LSH rows and a
    * stream-static (band, bucket) equijoin with exact-Jaccard verify
    * (MinHashLsh.nearDupAgainstCorpus). The oracle states the exact
    * cross-half formulation; banding equals it on this corpus for the
    * same reason q26 equals q19 (true pairs sit ≥ 0.9).
    */
  val q87 = QueryDef.sql(
    "q87_stream_online_dedup",
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |         unnest(list_transform(range(1, len(t) - 1),
      |                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      |       FROM tok),
      |ca AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |p AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
      |      FROM sh a JOIN sh b ON a.s = b.s
      |      WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
      |      GROUP BY 1, 2)
      |SELECT DISTINCT db AS doc_id FROM p
      |JOIN ca x ON da = x.doc_id JOIN ca y ON db = y.doc_id
      |WHERE CAST(c AS DOUBLE) / (x.n + y.n - c) >= 0.6""".stripMargin) { (spark, dir) =>
    val historical = Tables.documents(spark, dir).filter(col("doc_id") % 2 === 0)
    val incoming = Replay.documentsStream(spark, dir).filter(col("doc_id") % 2 === 1)
    Replay.runToResultAppend(spark,
      MinHashLsh.nearDupAgainstCorpus(historical, incoming, "doc_id", "text"))
  }

  /** Q103: SESSION-scoped correlation of two streams — purchases
    * attributed to the 30-minute activity session (views + purchases)
    * they fall in, per user: the funnel-attribution shape q92 implies,
    * continuously. The Spark-first form is union-then-sessionize: both
    * streams flow through ONE session_window aggregate whose conditional
    * sums carry each stream's contribution — a single stateful operator
    * with per-live-session state, instead of the unsupported (and
    * state-heavier) session-aggregate → stream-stream-join chain. The
    * oracle is the batch gaps-and-islands session join over the same
    * two event classes, with q24b's strict `> 30 minutes` break rule.
    */
  val q103 = QueryDef.sql(
    "q103_stream_session_attrib",
    """WITH e AS (SELECT user_id, ts, event_id, event_type, value
      |           FROM events WHERE event_type IN ('view', 'purchase')),
      |x AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL
      |                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
      |                     THEN 1 ELSE 0 END AS brk
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |y AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                               ROWS UNBOUNDED PRECEDING) AS grp
      |      FROM x),
      |s AS (SELECT user_id,
      |             CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_s,
      |             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_views,
      |             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
      |             CAST(sum(CASE WHEN event_type = 'purchase'
      |                           THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
      |                           ELSE 0 END) AS DOUBLE) / 100.0 AS purchase_value
      |      FROM y GROUP BY user_id, grp)
      |SELECT * FROM s WHERE n_purchases > 0""".stripMargin) { (spark, dir) =>
    val src = Replay.eventsStream(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .withWatermark("ts", "10 minutes")
    val agg = src
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n_views"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases"),
        (sum(when(col("event_type") === "purchase",
            graft.ops.FixedPoint.fixed(col("value"), 100))
          .otherwise(lit(0).cast("decimal(38,0)")))
          .cast("double") / 100.0).as("purchase_value"))
    Replay.runToResult(spark, agg)
      .filter(col("n_purchases") > 0)
      .select(col("user_id"),
        col("session_window.start").cast("long").as("session_start_s"),
        col("n_views"), col("n_purchases"), col("purchase_value"))
  }

  /** Q126: STREAMING windowed quantiles — the quantile sketch (q123)
    * through the state store per event-time window, exactly q86's shape
    * for TopK: one stateful aggregate whose per-window state is the
    * O(k·log n) sketch buffer, not the window's rows. Capacity 32
    * FORCES compactions at the ~70-events-per-window scale, so the
    * state-store serialization round-trips a genuinely multi-level
    * sketch. Guarantee band: the oracle states each window's exact
    * median; the engine emits it exactly (batch percentile) plus a
    * certificate that the STREAMED sketch's median lands within
    * max(3 ranks, 5%) of the target rank in every window.
    */
  val q126 = QueryDef.sql(
    "q126_stream_window_quantile",
    """SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS bucket_s,
      |       CAST(quantile_cont(value, 0.5) AS DOUBLE) AS p50,
      |       count(*) AS cnt,
      |       TRUE AS sketch_ok
      |FROM events GROUP BY 1""".stripMargin) { (spark, dir) =>
    val qsk = udaf(new graft.functions.QuantileSketchAgg(32))
    val agg = Replay.eventsStream(spark, dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(qsk(col("value")).as("sk"))
    val probe = udf((packed: Seq[Double]) =>
      graft.functions.QuantileSketchAgg.quantile(packed.toArray, 0.5))
    val est = Replay.runToResult(spark, agg)
      .select(col("window.start").cast("long").as("bucket_s"),
        probe(col("sk")).as("e50")) // per-window model-sized probe
    val ev = Tables.events(spark, dir)
      .select((floor(unix_timestamp(col("ts")) / 300) * 300).cast("long")
        .as("bucket_s"), col("value"))
    val cert = ev.join(broadcast(est), Seq("bucket_s"))
      .groupBy(col("bucket_s"))
      .agg((abs(sum(when(col("value") <= col("e50"), 1L).otherwise(0L))
          - lit(0.5) * count(lit(1))) <=
        greatest(lit(3.0), lit(0.05) * count(lit(1)))).as("sketch_ok"))
    ev.groupBy(col("bucket_s"))
      .agg(percentile(col("value"), lit(0.5)).as("p50"),
        count(lit(1)).as("cnt"))
      .join(cert, Seq("bucket_s"))
  }

  val all: Seq[QueryDef] = Seq(q23, q24a, q24b, q25, q39, q56, q71, q85, q86,
    q87, q97, q100, q103, q126)
}
