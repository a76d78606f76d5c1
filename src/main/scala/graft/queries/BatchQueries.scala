package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.FixedPoint
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational surface (SURVEY.md §2.5 Q1–Q16).
  *
  * All of these compile to single declarative Catalyst plans: filters and
  * projections are pushed into the parquet scan, aggregates run with
  * map-side partial aggregation, small dimension joins are broadcast. At
  * 100 TB the same plans hold: the only shuffles are on the grouping/join
  * keys, and AQE handles skew/plan-size decisions at runtime.
  */
object BatchQueries {

  /** Q1: filter + projection; both reach the parquet scan (PushedFilters). */
  val q01 = QueryDef.sql(
    "q01_filter_project",
    """SELECT l_orderkey, l_linenumber,
      |       l_extendedprice * (1 - l_discount) AS revenue
      |FROM lineitem
      |WHERE l_shipdate < TIMESTAMP '1996-01-01'
      |  AND l_discount BETWEEN 0.02 AND 0.09""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp")
        && col("l_discount").between(0.02, 0.09))
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
  }

  /** Q2: TPC-H Q1 shape — multi-key hash aggregation with partial agg.
    *
    * Money columns are summed in FIXED POINT: each value is rounded to
    * its decimal grain as an integer (cents / micros) and the integers
    * are accumulated into DECIMAL(38,0). Exact and order-independent
    * like the previous all-DECIMAL formulation — the result is bitwise
    * identical regardless of partitioning (double sums would carry ulp
    * noise that differs run-to-run at 1000 executors, let alone between
    * engines) — but 1.9× faster (1.36 s → 0.72 s at sf0.1): the long →
    * compact-Decimal conversion replaces a per-row double → BigDecimal
    * setScale. DECIMAL(38,0) rather than a raw BIGINT sum because a
    * micros-grain group sum exceeds int64 around $9.2e12 — reachable in
    * a 100 TB group — and Spark's non-ANSI long sum would wrap SILENTLY
    * there; the decimal accumulator overflows to null loudly instead.
    * The rounding step is floor(x·scale + 0.5) in both engines: IEEE
    * double ops are deterministic, so Spark and the oracle round
    * identically (DuckDB's CAST(x AS DECIMAL) rounds the exact value,
    * which can disagree with double arithmetic in the last ulp).
    */
  val q02 = QueryDef.sql(
    "q02_agg",
    """SELECT l_returnflag, l_linestatus,
      |       CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
      |       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
      |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_disc_price,
      |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_charge,
      |       CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 / count(*) AS avg_qty,
      |       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 / count(*) AS avg_price,
      |       CAST(sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 / count(*) AS avg_disc,
      |       count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
    val disc = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val cnt = count(lit(1))
    def cents(c: org.apache.spark.sql.Column) = FixedPoint.sumFixed(c, 100)
    def micros(c: org.apache.spark.sql.Column) = FixedPoint.sumFixed(c, 1000000)
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (cents(col("l_quantity")) / 100.0).as("sum_qty"),
        (cents(col("l_extendedprice")) / 100.0).as("sum_base_price"),
        (micros(disc) / 1e6).as("sum_disc_price"),
        (micros(disc * (lit(1) + col("l_tax"))) / 1e6).as("sum_charge"),
        (cents(col("l_quantity")) / 100.0 / cnt).as("avg_qty"),
        (cents(col("l_extendedprice")) / 100.0 / cnt).as("avg_price"),
        (cents(col("l_discount")) / 100.0 / cnt).as("avg_disc"),
        cnt.as("count_order"))
  }

  /** Q3: inner equi-join against a broadcast dimension (25 rows). */
  val q03 = QueryDef.sql(
    "q03_join_broadcast",
    """SELECT n_name, count(*) AS cnt
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin) { (spark, dir) =>
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Q4: multi-way join (TPC-H Q3 family) — customer⋈orders⋈lineitem.
    * Revenue in micros-grain fixed point (see [[FixedPoint]]): exact and
    * order-independent like the previous DECIMAL(24,6) sum, without the
    * per-row BigDecimal.setScale.
    */
  val q04 = QueryDef.sql(
    "q04_multijoin",
    """SELECT c_custkey,
      |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderdate < TIMESTAMP '1998-07-01'
      |  AND l_shipdate > TIMESTAMP '1998-07-01'
      |GROUP BY c_custkey""".stripMargin) { (spark, dir) =>
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .filter(col("o_orderdate") < lit("1998-07-01").cast("timestamp")
        && col("l_shipdate") > lit("1998-07-01").cast("timestamp"))
      .groupBy(col("c_custkey"))
      .agg((FixedPoint.sumFixed(
        col("l_extendedprice") * (lit(1) - col("l_discount")), 1000000) / 1e6).as("revenue"))
  }

  /** Q5: anti join — customers with no orders since mid-2000. */
  val q05 = QueryDef.sql(
    "q05_anti_join",
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |                  AND o.o_orderdate >= TIMESTAMP '2000-06-01')""".stripMargin) { (spark, dir) =>
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2000-06-01").cast("timestamp"))
    Tables.customer(spark, dir)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  /** Q5b: FULL OUTER join — per-user purchase counts vs error counts;
    * users appear with nulls on whichever side they lack.
    */
  val q05b = QueryDef.sql(
    "q05b_full_outer",
    """SELECT COALESCE(p.user_id, e.user_id) AS user_id, p.pcnt, e.ecnt
      |FROM (SELECT user_id, count(*) AS pcnt FROM events
      |      WHERE event_type = 'purchase' GROUP BY 1) p
      |FULL JOIN (SELECT user_id, count(*) AS ecnt FROM events
      |           WHERE event_type = 'error' GROUP BY 1) e
      |ON p.user_id = e.user_id""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("p_uid")).agg(count(lit(1)).as("pcnt"))
    val e = ev.filter(col("event_type") === "error")
      .groupBy(col("user_id").as("e_uid")).agg(count(lit(1)).as("ecnt"))
    p.join(e, col("p_uid") === col("e_uid"), "full_outer")
      .select(coalesce(col("p_uid"), col("e_uid")).as("user_id"),
        col("pcnt"), col("ecnt"))
  }

  /** Q6: semi join — customers with ≥1 order in a date range. */
  val q06 = QueryDef.sql(
    "q06_semi_join",
    """SELECT c_custkey, c_mktsegment FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |              AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31')""".stripMargin) { (spark, dir) =>
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate").between(
        lit("1996-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp")))
    Tables.customer(spark, dir)
      .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
  }

  /** Q7: top-k per group via ranking window (deterministic tiebreak). */
  val q07 = QueryDef.sql(
    "q07_topk_window",
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) WHERE rn <= 3""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
  }

  /** Q8: analytic window with an explicit ROWS frame (running sum).
    * Fixed-point like every money sum: engines associate windowed sums
    * differently (DuckDB segment-tree vs Spark sequential), and running
    * sums of 2-decimal prices land exactly on rounding half-points —
    * integer accumulation is associativity-proof.
    */
  val q08 = QueryDef.sql(
    "q08_running_window",
    """SELECT o_custkey, o_orderkey,
      |       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |            OVER (PARTITION BY o_custkey
      |                  ORDER BY o_orderdate, o_orderkey
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS running_rev
      |FROM orders""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        (sum(FixedPoint.fixed(col("o_totalprice"), 100)).over(w)
          .cast("double") / 100.0).as("running_rev"))
  }

  /** Q9: lag — per-user inter-event gap in microseconds (exact integers). */
  val q09 = QueryDef.sql(
    "q09_lag",
    """SELECT user_id, event_id,
      |       date_diff('microsecond',
      |                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
      |                 ts) AS gap_us
      |FROM events""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))).as("gap_us"))
  }

  /** Q10: global sort + limit with deterministic tiebreak. */
  val q10 = QueryDef.sql(
    "q10_sort_limit",
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(20)
  }

  /** Q11: distinct + set operations (INTERSECT / EXCEPT), tagged union. */
  val q11 = QueryDef.sql(
    "q11_setops",
    """SELECT 'both' AS tag, user_id FROM (
      |  SELECT user_id FROM events WHERE event_type = 'purchase'
      |  INTERSECT
      |  SELECT user_id FROM events WHERE event_type = 'error')
      |UNION ALL
      |SELECT 'buy_only' AS tag, user_id FROM (
      |  SELECT user_id FROM events WHERE event_type = 'purchase'
      |  EXCEPT
      |  SELECT user_id FROM events WHERE event_type = 'error')""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val buyers = ev.filter(col("event_type") === "purchase").select(col("user_id"))
    val errored = ev.filter(col("event_type") === "error").select(col("user_id"))
    buyers.intersect(errored).withColumn("tag", lit("both"))
      .unionByName(buyers.except(errored).withColumn("tag", lit("buy_only")))
      .select(col("tag"), col("user_id"))
  }

  /** Q12: ROLLUP grouping sets. The revenue expression is projected
    * BEFORE the rollup: grouping sets run through Expand, which
    * duplicates every input row per grouping set and would re-evaluate
    * an inline aggregate-input expression on each copy (measured 2× at
    * sf0.1 for CUBE's 4 sets).
    */
  val q12 = QueryDef.sql(
    "q12_rollup",
    """SELECT l_returnflag, l_linestatus,
      |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue,
      |       count(*) AS cnt
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"),
        FixedPoint.fixed(
          col("l_extendedprice") * (lit(1) - col("l_discount")), 1000000).as("_rev"))
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg((sum(col("_rev")).cast("double") / 1e6).as("revenue"),
        count(lit(1)).as("cnt"))
  }

  /** Q12b: CUBE grouping sets (all 2^2 combinations); same pre-Expand
    * projection as q12.
    */
  val q12b = QueryDef.sql(
    "q12b_cube",
    """SELECT l_returnflag, l_linestatus,
      |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue,
      |       count(*) AS cnt
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"),
        FixedPoint.fixed(
          col("l_extendedprice") * (lit(1) - col("l_discount")), 1000000).as("_rev"))
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg((sum(col("_rev")).cast("double") / 1e6).as("revenue"),
        count(lit(1)).as("cnt"))
  }

  /** Q13: approx_count_distinct (HLL++) asserted within a 5% band of the
    * exact count — both engines' sketches differ, so the hash-stable
    * output is the band check plus the exact count. Spark's sketch runs
    * at rsd=0.01: with the default rsd=0.05 the 5% band is a ~1-sigma
    * check that fails a third of the time; at 1% rsd both engines sit
    * comfortably inside it.
    *
    * The sketch and the exact count run as SEPARATE single-row
    * aggregates joined at the end: mixing a distinct aggregate with a
    * sketch in one Aggregate triggers Spark's distinct-rewrite, which
    * keys the first phase by l_partkey and carries the full 1639-word
    * HLL buffer PER KEY through the shuffle (~13 KB/key — measured 6×
    * slower at sf0.1; ruinous at scale). Split, the sketch keeps one
    * buffer per partition and the distinct count shuffles only keys.
    */
  val q13 = QueryDef.sql(
    "q13_approx_distinct",
    """SELECT (abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
      |        <= 0.05 * count(DISTINCT l_partkey)) AS within_5pct,
      |       count(DISTINCT l_partkey) AS exact_cnt
      |FROM lineitem""".stripMargin) { (spark, dir) =>
    val li = Tables.lineitem(spark, dir)
    val approx = li.agg(approx_count_distinct(col("l_partkey"), 0.01).as("_apx"))
    val exact = li.agg(countDistinct(col("l_partkey")).as("exact_cnt"))
    approx.crossJoin(exact) // 1 row × 1 row
      .select(
        (abs(col("_apx") - col("exact_cnt")) <= lit(0.05) * col("exact_cnt"))
          .as("within_5pct"),
        col("exact_cnt"))
  }

  /** Q14: scalar string/date/math functions. */
  val q14 = QueryDef.sql(
    "q14_scalar_fns",
    """SELECT o_orderkey,
      |       upper(substr(o_orderpriority, 1, 3)) AS pri3,
      |       CAST(length(o_orderpriority) AS BIGINT) AS pri_len,
      |       concat(o_orderstatus, '-', o_orderpriority) AS status_pri,
      |       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
      |       CAST(extract(year FROM o_orderdate) AS BIGINT) AS order_year,
      |       round(o_totalprice / 7, 2) AS price_div,
      |       abs(o_totalprice - 100000.0) AS price_dist
      |FROM orders""".stripMargin) { (spark, dir) =>
    Tables.orders(spark, dir).select(
      col("o_orderkey"),
      upper(substring(col("o_orderpriority"), 1, 3)).as("pri3"),
      length(col("o_orderpriority")).cast("long").as("pri_len"),
      concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("status_pri"),
      date_trunc("month", col("o_orderdate")).as("order_month"),
      year(col("o_orderdate")).cast("long").as("order_year"),
      round(col("o_totalprice") / 7, 2).as("price_div"),
      abs(col("o_totalprice") - 100000.0).as("price_dist"))
  }

  /** Q15: JSON scalar extraction from `events.props`. */
  val q15 = QueryDef.sql(
    "q15_json",
    """SELECT event_type,
      |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |       count(*) AS cnt
      |FROM events GROUP BY event_type""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
        count(lit(1)).as("cnt"))
  }

  /** Q16: array higher-order functions over the embedding column. Both
    * engines fold sequentially in doubles, so the values match bitwise.
    */
  val q16 = QueryDef.sql(
    "q16_array_fns",
    """SELECT vec_id,
      |       CAST(len(embedding) AS BIGINT) AS dim,
      |       CAST(embedding[1] AS DOUBLE) AS first_elem,
      |       list_sum(list_transform(embedding,
      |                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS sq_norm
      |FROM embeddings""".stripMargin) { (spark, dir) =>
    Tables.embeddings(spark, dir).select(
      col("vec_id"),
      size(col("embedding")).cast("long").as("dim"),
      element_at(col("embedding"), 1).cast("double").as("first_elem"),
      expr("aggregate(embedding, cast(0 as double), " +
        "(acc, x) -> acc + cast(x as double) * cast(x as double))").as("sq_norm"))
  }

  /** Q38: exact grouped percentiles — Spark `percentile` and DuckDB
    * `quantile_cont` share the interpolated-rank definition
    * (index p·(n−1), linear interpolation), so exact values hash-match.
    * percentile_approx would need a band check like q13; the exact form
    * is a single sort-based aggregate per group and stays one shuffle.
    */
  val q38 = QueryDef.sql(
    "q38_percentiles",
    """SELECT o_orderpriority,
      |       CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE) AS p50,
      |       CAST(quantile_cont(o_totalprice, 0.95) AS DOUBLE) AS p95,
      |       CAST(quantile_cont(o_totalprice, 0.99) AS DOUBLE) AS p99,
      |       count(*) AS cnt
      |FROM orders GROUP BY o_orderpriority""".stripMargin) { (spark, dir) =>
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        percentile(col("o_totalprice"), lit(0.5)).as("p50"),
        percentile(col("o_totalprice"), lit(0.95)).as("p95"),
        percentile(col("o_totalprice"), lit(0.99)).as("p99"),
        count(lit(1)).as("cnt"))
  }

  /** Q46: approx-percentile sketch, band-checked like q13: each engine
    * runs its OWN sketch (Spark GK at accuracy 1000, DuckDB t-digest)
    * and asserts it lands within 5% of the exact interpolated quantile;
    * the hash-stable output is the band flags plus the exact values
    * (which match bitwise per the q38 argument). The sketch is one
    * mergeable buffer per partition — the distributed shape that
    * replaces exact percentiles when a 100 TB column can't be sorted
    * per group.
    */
  val q46 = QueryDef.sql(
    "q46_approx_percentile",
    """SELECT (abs(approx_quantile(l_quantity, 0.5) - quantile_cont(l_quantity, 0.5))
      |        <= 0.05 * quantile_cont(l_quantity, 0.5)) AS p50_ok,
      |       (abs(approx_quantile(l_quantity, 0.9) - quantile_cont(l_quantity, 0.9))
      |        <= 0.05 * quantile_cont(l_quantity, 0.9)) AS p90_ok,
      |       CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS exact_p50,
      |       CAST(quantile_cont(l_quantity, 0.9) AS DOUBLE) AS exact_p90
      |FROM lineitem""".stripMargin) { (spark, dir) =>
    // l_quantity deliberately: Spark's exact `percentile` buffers a
    // counts-map keyed by DISTINCT value, so the scale limit is value
    // cardinality (50 here — the map stays tiny and merges trivially),
    // not row count; over the quasi-unique l_extendedprice the same
    // aggregate boxed 600k doubles per partition and ran 4.5 s at sf0.1.
    // High-cardinality columns at scale belong to the SKETCH (whose
    // buffer is bounded by accuracy) — that is what the band check
    // certifies it for. Band is 5%: GK reports an actual data value, so
    // on this discrete 1..50 domain one neighbor off the true quantile
    // is a 4% value error (the 2% band failed at sf0.1 on exactly
    // that); the sketch's rank error cannot skip more than one value.
    Tables.lineitem(spark, dir).agg(
      percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("_a50"),
      percentile_approx(col("l_quantity"), lit(0.9), lit(1000)).as("_a90"),
      percentile(col("l_quantity"), lit(0.5)).as("exact_p50"),
      percentile(col("l_quantity"), lit(0.9)).as("exact_p90"))
      .select(
        (abs(col("_a50") - col("exact_p50")) <= lit(0.05) * col("exact_p50")).as("p50_ok"),
        (abs(col("_a90") - col("exact_p90")) <= lit(0.05) * col("exact_p90")).as("p90_ok"),
        col("exact_p50"), col("exact_p90"))
  }

  /** Q40: distribution window functions — ntile/percent_rank/cume_dist
    * share exact rank-arithmetic definitions across engines, and
    * first_value pins the frame semantics; deterministic under the
    * (o_totalprice, o_orderkey) tiebreak.
    */
  val q40 = QueryDef.sql(
    "q40_window_distribution",
    """SELECT o_orderkey,
      |       ntile(4) OVER w AS quartile,
      |       CAST(percent_rank() OVER w AS DOUBLE) AS pr,
      |       CAST(cume_dist() OVER w AS DOUBLE) AS cd,
      |       first_value(o_orderkey) OVER w AS first_k
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority
      |             ORDER BY o_totalprice, o_orderkey)""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir).select(
      col("o_orderkey"),
      ntile(4).over(w).as("quartile"),
      percent_rank().over(w).cast("double").as("pr"),
      cume_dist().over(w).cast("double").as("cd"),
      first_value(col("o_orderkey")).over(w).as("first_k"))
  }

  /** Q50: pivot aggregation — long-to-wide by l_linestatus, values
    * enumerated so no discovery pass runs. One cross-engine edge needs
    * explicit handling: for a (returnflag, linestatus) cell with NO
    * rows, Spark's PivotFirst rewrite yields NULL for the count where
    * SQL's count(CASE WHEN ...) yields 0 — coalesce the count columns
    * so empty cells agree (sum is NULL over no rows in both engines,
    * so the revenue columns already agree).
    */
  val q50 = QueryDef.sql(
    "q50_pivot",
    """SELECT l_returnflag,
      |       CAST(count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT) AS F_cnt,
      |       CAST(sum(CASE WHEN l_linestatus = 'F'
      |                THEN CAST(floor(l_extendedprice * (1 - l_discount) * 1000000 + 0.5) AS BIGINT) END)
      |            AS DOUBLE) / 1000000.0 AS F_rev,
      |       CAST(count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT) AS O_cnt,
      |       CAST(sum(CASE WHEN l_linestatus = 'O'
      |                THEN CAST(floor(l_extendedprice * (1 - l_discount) * 1000000 + 0.5) AS BIGINT) END)
      |            AS DOUBLE) / 1000000.0 AS O_rev
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (spark, dir) =>
    val disc = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)).as("cnt"),
        (FixedPoint.sumFixed(disc, 1000000) / 1e6).as("rev"))
      .select(col("l_returnflag"),
        coalesce(col("F_cnt"), lit(0L)).as("F_cnt"), col("F_rev"),
        coalesce(col("O_cnt"), lit(0L)).as("O_cnt"), col("O_rev"))
  }

  /** Q51: batch sessionization (gaps-and-islands) — the batch
    * counterpart of q24b's streaming session_window, 30-minute gap,
    * matching break semantics (exact-gap stays in-session).
    */
  val q51 = QueryDef.sql(
    "q51_sessionize",
    """SELECT user_id, event_id,
      |       CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |         AS session_no
      |FROM (SELECT user_id, event_id, ts,
      |        CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |               OR date_diff('microsecond',
      |                    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
      |                    ts) > 1800000000
      |             THEN 1 ELSE 0 END AS brk
      |      FROM events)""".stripMargin) { (spark, dir) =>
    graft.ops.Sessions.assign(Tables.events(spark, dir),
      "user_id", "ts", "event_id", 1800000000L)
      .select(col("user_id"), col("event_id"), col("session_no"))
  }

  /** Q52: time-series resample + gap fill — per-user hourly buckets on a
    * dense spine from each user's first to last hour, empty hours filled
    * with count 0 and the last observed hourly value carried forward
    * (LOCF). Frames are explicit ROWS on both sides; (user, hour) is
    * unique per partition so ROWS ≡ RANGE and the ignore-nulls last_value
    * semantics match.
    */
  val q52 = QueryDef.sql(
    "q52_resample_locf",
    """WITH b AS (SELECT user_id, date_trunc('hour', ts) AS h,
      |             count(*) AS cnt,
      |             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS val
      |           FROM events GROUP BY 1, 2),
      |span AS (SELECT user_id, min(h) AS mn, max(h) AS mx FROM b GROUP BY 1),
      |spine AS (SELECT user_id,
      |            unnest(list_transform(
      |              range(0, CAST(date_diff('hour', mn, mx) AS BIGINT) + 1),
      |              i -> mn + to_hours(i))) AS h
      |          FROM span)
      |SELECT s.user_id, s.h,
      |       CAST(COALESCE(b.cnt, 0) AS BIGINT) AS cnt,
      |       last_value(b.val IGNORE NULLS)
      |         OVER (PARTITION BY s.user_id ORDER BY s.h
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_val
      |FROM spine s LEFT JOIN b USING (user_id, h)""".stripMargin) { (spark, dir) =>
    graft.ops.Resample.locf(Tables.events(spark, dir),
      "user_id", "ts", "value", "hour", "interval 1 hour")
  }

  /** Q79: exact top-3 event values per user through the bounded-buffer
    * typed Aggregator (functions.TopKAgg) — same result as the
    * `row_number` window the oracle states, but the shuffle carries
    * k·groups values instead of every row (see TopKAgg's scaladoc).
    * Values at 2-decimal grain make the rank sequence engine-stable
    * (ties produce equal VALUES, so row identity never matters).
    */
  val q79 = QueryDef.sql(
    "q79_topk_agg",
    """SELECT user_id, rnk, v FROM (
      |  SELECT user_id, value AS v,
      |         row_number() OVER (PARTITION BY user_id ORDER BY value DESC) AS rnk
      |  FROM events) WHERE rnk <= 3""".stripMargin) { (spark, dir) =>
    val topk = udaf(new graft.functions.TopKAgg(3))
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(topk(col("value")).as("vs"))
      .select(col("user_id"), posexplode(col("vs")))
      .select(col("user_id"), (col("pos") + 1).cast("long").as("rnk"),
        col("col").as("v"))
  }

  /** Q78: MERGEABLE distinct-count sketches (Datasketches HLL) — the
    * 100 TB pattern q13's one-shot estimate can't show: per-group
    * sketches are materialized once (a precomputed rollup column), then
    * UNION-MERGED into coarser rollups without touching the raw data
    * again. Both levels are band-checked against the exact counts the
    * oracle states (guarantee-band pattern): per-type estimates within
    * 5%, and the global estimate — computed ONLY from the 5 per-type
    * sketches, never from rows — within 5% of the true global distinct.
    * Exact distincts and sketches run in SEPARATE aggregates (the q13
    * lesson: mixing them triggers the distinct-rewrite that ships a
    * full HLL buffer per key through the shuffle).
    */
  val q78 = QueryDef.sql(
    "q78_hll_merge",
    """SELECT event_type AS grp,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
      |       TRUE AS band_ok
      |FROM events GROUP BY 1
      |UNION ALL
      |SELECT 'ALL', CAST(count(DISTINCT user_id) AS BIGINT), TRUE
      |FROM events""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val sk = ev.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val est = sk.select(col("event_type"), hll_sketch_estimate(col("sk")).as("est"))
    val exact = ev.groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("exact_users"))
    val per = exact.join(est, "event_type")
      .select(col("event_type").as("grp"), col("exact_users"),
        (abs(col("est") - col("exact_users")) <= lit(0.05) * col("exact_users"))
          .as("band_ok"))
    val gEst = sk.agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val gExact = ev.agg(count_distinct(col("user_id")).as("exact_users"))
    val glob = gExact.crossJoin(broadcast(gEst)) // 1 row × 1 row
      .select(lit("ALL").as("grp"), col("exact_users"),
        (abs(col("est") - col("exact_users")) <= lit(0.05) * col("exact_users"))
          .as("band_ok"))
    per.unionAll(glob)
  }

  /** Q75: exponentially time-decayed per-user activity score (τ = 1
    * day against the corpus-max timestamp) — the recency-weighted
    * feature shape; see ops.Decay for why this costs exactly one keyed
    * aggregate at any scale.
    */
  val q75 = QueryDef.sql(
    "q75_decayed_sum",
    """WITH t AS (SELECT max(epoch_us(ts)) AS T FROM events)
      |SELECT user_id, count(*) AS n_events,
      |       sum(value * exp(-CAST(T - epoch_us(ts) AS DOUBLE) / 86400000000.0))
      |         AS decayed_sum
      |FROM events CROSS JOIN t GROUP BY user_id""".stripMargin) { (spark, dir) =>
    graft.ops.Decay.decayedSum(Tables.events(spark, dir), "user_id", "ts",
      col("value"), tauSec = 86400L)
  }

  /** Q55: Z-order (Morton) value — the interleave arithmetic behind the
    * multi-dimensional layout (ops.ZOrder; pruning itself is
    * plan-asserted in ZOrderSpec since DuckDB has no partition scans).
    * Both engines compute the identical integer expression.
    */
  val q55 = QueryDef.sql(
    "q55_zorder_value", {
      val terms = (0 until 8).map { i =>
        s"((user_id % 256) // ${1 << i}) % 2 * ${1L << (2 * i)} + " +
          s"((event_id % 256) // ${1 << i}) % 2 * ${1L << (2 * i + 1)}"
      }.mkString(" + ")
      s"SELECT event_id, CAST($terms AS BIGINT) AS z FROM events"
    }) { (spark, dir) =>
    Tables.events(spark, dir).select(col("event_id"),
      graft.ops.ZOrder.zValue(
        pmod(col("user_id"), lit(256)).cast("int"),
        pmod(col("event_id"), lit(256)).cast("int"), 8).as("z"))
  }

  /** Q110: time-RANGE window frame — rolling 30-day revenue per
    * customer, the value-based frame class q08's ROWS frame cannot
    * express (a RANGE frame bounds by ORDER-BY VALUE and includes all
    * peers of a tied date on both engines, so ties are
    * order-independent by construction). Money through per-row integer
    * cents summed as longs over the frame — exact on any engine. One
    * shuffle+sort per customer partition; the frame is bounded by the
    * 30-day value span, never the partition length.
    */
  val q110 = QueryDef.sql(
    "q110_rolling_range_window",
    """SELECT o_custkey, o_orderkey,
      |       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER (
      |         PARTITION BY o_custkey ORDER BY o_orderdate
      |         RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
      |       ) AS DOUBLE) / 100.0 AS rolling_total
      |FROM orders""".stripMargin) { (spark, dir) =>
    // unix_micros over the TIMESTAMP order date is tz-free only under
    // the library's documented UTC-session contract (Tables.load) — a
    // foreign non-UTC session would shift the frame across DST edges
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(unix_micros(col("o_orderdate")))
      .rangeBetween(-30L * 86400 * 1000000, 0)
    Tables.orders(spark, dir).select(col("o_custkey"), col("o_orderkey"),
      (sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).over(w)
        .cast("double") / 100.0).as("rolling_total"))
  }

  /** Q111: explicit GROUPING SETS — the general form q12/q12b's
    * rollup/cube are shorthands of, with an asymmetric set list a
    * rollup cannot express, plus per-column grouping() flags (emitted
    * explicitly rather than as a packed grouping_id so the bit
    * convention cannot diverge between engines). Catalyst plans one
    * Expand + one aggregate — the same single-shuffle shape as cube.
    */
  val q111 = QueryDef.sql(
    "q111_grouping_sets",
    """SELECT l_returnflag, l_linestatus,
      |       CAST(grouping(l_returnflag) AS INTEGER) AS g_rf,
      |       CAST(grouping(l_linestatus) AS INTEGER) AS g_ls,
      |       count(*) AS cnt,
      |       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
      |         / 100.0 AS revenue
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |                        (l_returnflag), ())""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_gs")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |       CAST(grouping(l_linestatus) AS INT) AS g_ls,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
        |         / 100.0 AS revenue
        |FROM lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_returnflag), ())""".stripMargin)
  }

  /** Q112: UNPIVOT (melt) — q50's pivot in reverse: the per-line charge
    * components turn from three columns into (component, amount) rows
    * via the native Dataset `unpivot` (Spark's melt, one map-side
    * Expand — no shuffle at all). Values pass through untouched, so the
    * doubles hash-match the oracle's UNPIVOT bit-for-bit.
    */
  val q112 = QueryDef.sql(
    "q112_unpivot",
    """SELECT l_orderkey, l_linenumber, component, amount
      |FROM (SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount, l_tax
      |      FROM lineitem)
      |UNPIVOT (amount FOR component IN (l_extendedprice, l_discount, l_tax))""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "component", "amount")
  }

  /** Q113: bag-semantics set operations — INTERSECT ALL / EXCEPT ALL
    * keep multiplicities (min / truncated difference of duplicate
    * counts), which the q11 DISTINCT forms erase. Both engines
    * implement the same SQL-standard bag algebra; the per-user purchase
    * and error event streams carry real duplicate user_ids, so the
    * multiplicity arithmetic is exercised for real.
    */
  val q113 = QueryDef.sql(
    "q113_setops_all",
    """SELECT 'common_bag' AS tag, user_id FROM (
      |  SELECT user_id FROM events WHERE event_type = 'purchase'
      |  INTERSECT ALL
      |  SELECT user_id FROM events WHERE event_type = 'error')
      |UNION ALL
      |SELECT 'excess_buys' AS tag, user_id FROM (
      |  SELECT user_id FROM events WHERE event_type = 'purchase'
      |  EXCEPT ALL
      |  SELECT user_id FROM events WHERE event_type = 'error')""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    val buys = ev.filter(col("event_type") === "purchase").select(col("user_id"))
    val errs = ev.filter(col("event_type") === "error").select(col("user_id"))
    buys.intersectAll(errs).select(lit("common_bag").as("tag"), col("user_id"))
      .unionByName(
        buys.exceptAll(errs).select(lit("excess_buys").as("tag"), col("user_id")))
  }

  /** Q114: correlated SCALAR subquery — each customer's orders priced
    * within 10% of that customer's own maximum. Catalyst DECORRELATES
    * the inner aggregate into a grouped join (RewriteCorrelatedScalarSubquery)
    * — the plan is an aggregate + equijoin, never a per-row re-execution
    * — which is exactly what makes the construct usable at 100 TB. Both
    * engines compute the same decorrelated algebra; the 10% band makes
    * the double comparison a strict product test on both sides.
    */
  val q114 = QueryDef.sql(
    "q114_correlated_subquery",
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders o
      |WHERE o_totalprice >= 0.9 * (SELECT max(o2.o_totalprice)
      |                             FROM orders o2
      |                             WHERE o2.o_custkey = o.o_custkey)""".stripMargin) { (spark, dir) =>
    Tables.orders(spark, dir).createOrReplaceTempView("orders_corr")
    spark.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders_corr o
        |WHERE o_totalprice >= 0.9 * (SELECT max(o2.o_totalprice)
        |                             FROM orders_corr o2
        |                             WHERE o2.o_custkey = o.o_custkey)""".stripMargin)
  }

  /** Q121: correlated LATERAL subquery — the table-valued sibling of
    * q114's scalar correlation: top-3 orders PER customer as a lateral
    * derived table with its own ORDER BY/LIMIT. Catalyst decorrelates
    * the per-row limit into a ranked window join (DecorrelateInnerQuery
    * + RewriteLateralSubquery), so the plan is the same single-shuffle
    * window top-k a hand-written rank()<=3 produces — the surface
    * matters because BI generators emit exactly this SQL shape.
    * Customers with no orders are absent (inner lateral, both engines).
    */
  val q121 = QueryDef.sql(
    "q121_lateral_topn",
    """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
      |FROM customer c, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) o""".stripMargin) { (spark, dir) =>
    Tables.customer(spark, dir).createOrReplaceTempView("customer_lat")
    Tables.orders(spark, dir).createOrReplaceTempView("orders_lat")
    spark.sql(
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer_lat c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders_lat
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) o""".stripMargin)
  }

  /** Q123: mergeable QUANTILE sketch (functions.QuantileSketchAgg — the
    * sketch family's rank member, next to HLL/Count-Min/Bloom/TopK):
    * percentiles as ONE map-side-partial aggregate carrying
    * O(k·log(N/k)) doubles instead of q38's full-sort percentile — the
    * only percentile that runs at 100 TB. Guarantee-band oracle (q13's
    * discipline): the oracle states the EXACT percentiles; the engine
    * collects the finished sketch (model-sized, like q29's centroids),
    * probes p50/p95/p99, and certifies each probe's EXACT rank within
    * ±1% of its target rank in one distributed pass — so a broken
    * compaction or merge fails the row even though the sketch itself is
    * approximate.
    */
  val q123 = QueryDef.sql(
    "q123_quantile_sketch",
    """SELECT CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE) AS p50,
      |       CAST(quantile_cont(o_totalprice, 0.95) AS DOUBLE) AS p95,
      |       CAST(quantile_cont(o_totalprice, 0.99) AS DOUBLE) AS p99,
      |       count(*) AS cnt,
      |       TRUE AS sketch_ok
      |FROM orders""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val ords = Tables.orders(spark, dir)
    val packed = ords.select(col("o_totalprice").as("value")).as[Double]
      .select(new graft.functions.QuantileSketchAgg(400).toColumn)
      .head() // the SKETCH, not data: O(k log N) doubles
    val probes = Seq(0.5, 0.95, 0.99)
      .map(p => p -> graft.functions.QuantileSketchAgg.quantile(packed, p))
    val eps = 0.01
    val rankChecks = probes.map { case (p, est) =>
      val r = sum(when(col("o_totalprice") <= est, 1L).otherwise(0L))
      (abs(r - lit(p) * count(lit(1))) <= lit(eps) * count(lit(1)))
    }.reduce(_ && _)
    val cert = ords.agg(rankChecks.as("sketch_ok"))
    ords.agg(
      percentile(col("o_totalprice"), lit(0.5)).as("p50"),
      percentile(col("o_totalprice"), lit(0.95)).as("p95"),
      percentile(col("o_totalprice"), lit(0.99)).as("p99"),
      count(lit(1)).as("cnt"))
      .crossJoin(broadcast(cert)) // 1 row × 1 row
  }

  /** Q124: GROUPED quantile sketches — q123's sketch per group, built
    * and probed entirely through the registered SQL surface
    * (quantile_sketch_agg / quantile_sketch_probe) with NO driver
    * round-trip: the per-group certificate joins the probed estimates
    * back to the rows and checks each group's exact rank in one more
    * keyed aggregate. This is the sketch family's rollup contract in
    * action — the same grouped-sketch shape q78 pins for HLL.
    */
  val q124 = QueryDef.sql(
    "q124_quantile_sketch_groups",
    """SELECT o_orderpriority,
      |       CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE) AS p50,
      |       CAST(quantile_cont(o_totalprice, 0.95) AS DOUBLE) AS p95,
      |       count(*) AS cnt,
      |       TRUE AS sketch_ok
      |FROM orders GROUP BY o_orderpriority""".stripMargin) { (spark, dir) =>
    graft.GraftFunctions.registerAll(spark)
    val ords = Tables.orders(spark, dir)
    ords.createOrReplaceTempView("orders_qsk")
    val est = spark.sql(
      """SELECT o_orderpriority,
        |       quantile_sketch_probe(sk, 0.5) AS e50,
        |       quantile_sketch_probe(sk, 0.95) AS e95
        |FROM (SELECT o_orderpriority,
        |             quantile_sketch_agg(o_totalprice) AS sk
        |      FROM orders_qsk GROUP BY o_orderpriority)""".stripMargin)
    val eps = 0.01
    val cert = ords.join(broadcast(est), Seq("o_orderpriority"))
      .groupBy(col("o_orderpriority"))
      .agg(((abs(sum(when(col("o_totalprice") <= col("e50"), 1L).otherwise(0L))
          - lit(0.5) * count(lit(1))) <= lit(eps) * count(lit(1))) &&
        (abs(sum(when(col("o_totalprice") <= col("e95"), 1L).otherwise(0L))
          - lit(0.95) * count(lit(1))) <= lit(eps) * count(lit(1))))
        .as("sketch_ok"))
    ords.groupBy(col("o_orderpriority"))
      .agg(percentile(col("o_totalprice"), lit(0.5)).as("p50"),
        percentile(col("o_totalprice"), lit(0.95)).as("p95"),
        count(lit(1)).as("cnt"))
      .join(broadcast(cert), Seq("o_orderpriority"))
  }

  val all: Seq[QueryDef] = Seq(q01, q02, q03, q04, q05, q05b, q06, q07,
    q08, q09, q10, q11, q12, q12b, q13, q14, q15, q16, q38, q40, q46,
    q50, q51, q52, q55, q75, q78, q79, q110, q111, q112, q113, q114, q121,
    q123, q124)
}
