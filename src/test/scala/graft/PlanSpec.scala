package graft

import graft.queries.BatchQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape assertions: the properties that keep these queries fast at
  * 1000 executors are visible in the physical plan — filters reaching
  * the parquet scan, dimension joins broadcast, aggregates with map-side
  * partial aggregation, codegen'd kernels. Catching a regression here is
  * catching a 100× slowdown at scale before it ships.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q01: filter and projection are pushed into the parquet scan") {
    val p = plan(BatchQueries.q01.fn(spark, sf001))
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("l_shipdate"), "shipdate filter should reach the scan")
    // projection pruning: the scan must not read all 11 lineitem columns
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_tax"),
      s"column pruning failed: $readSchema")
  }

  test("q03: 25-row dimension join is a broadcast hash join") {
    val p = plan(BatchQueries.q03.fn(spark, sf001))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "dimension join must not sort-merge")
  }

  test("q02: aggregation runs with map-side partial aggregation") {
    val p = plan(BatchQueries.q02.fn(spark, sf001))
    // partial + final HashAggregate pair around the exchange
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("q20: cosine kernel is the codegen'd dot product, query side broadcast") {
    val df = graft.queries.MandateQueries.q20.fn(spark, sf001)
    val p = plan(df)
    assert(p.contains("dot_product_f"), "expected codegen'd kernel in plan")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "query set must broadcast, corpus must stream")
  }

  test("q17: LWW is a single-shuffle aggregate, one envelope parse per row") {
    val df = graft.queries.CdcQueries.q17.fn(spark, sf001)
    val p = df.queryExecution.executedPlan.toString
    assert("from_json".r.findAllIn(p).length <= 1,
      "envelope must parse exactly once per row (pushdown re-inlining regression)")
    assert("Exchange".r.findAllIn(p).length <= 2,
      "LWW should shuffle once on the key (plus AQE reads)")
  }

  test("q13: sketch and distinct-count do not mix into a per-key HLL aggregate") {
    val p = plan(BatchQueries.q13.fn(spark, sf001))
    // the mixed form plans an aggregate KEYED BY l_partkey whose partial
    // carries the full HLL buffer per key (MS[0..1638] under Keys
    // [l_partkey]); the split form keeps MS[] only in the global (no-key)
    // sketch aggregate — one buffer per partition
    val badNode = p.split("\n\\(").exists(node =>
      node.contains("Keys [1]: [l_partkey") && node.contains("MS["))
    assert(!badNode,
      "per-key HLL buffer detected: distinct+sketch collapsed into one aggregate")
  }

  test("q37: range join plans as an equijoin, not a cartesian/range product") {
    val p = graft.queries.JoinQueries.q37.fn(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q38: grouped percentiles are one shuffle") {
    val p = BatchQueries.q38.fn(spark, sf001)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).length <= 1,
      "percentile aggregate should shuffle once on the group key")
  }

  test("q48: shard packing never single-partitions the corpus") {
    val p = graft.queries.PipelineQueries.q48.fn(spark, sf001)
      .queryExecution.executedPlan.toString
    // the corpus-side window must be partitioned by the chunk bucket;
    // the only SinglePartition sort is the tiny per-bucket offsets
    // relation (bounded by corpus/chunk, i.e. metadata)
    val corpusWindows = p.linesIterator.filter(_.contains("Window"))
      .filter(_.contains("doc_id")).toSeq
    assert(corpusWindows.forall(_.contains("_bkt")),
      s"corpus window must partition by _bkt:\n${corpusWindows.mkString("\n")}")
  }

  test("q17e: SCD2 lead and row_number windows share one sort") {
    val p = graft.queries.CdcQueries.q17e.fn(spark, sf001)
      .queryExecution.executedPlan.toString
    // dedupe aggregate shuffles on (key, ts); windows shuffle on key;
    // the filter between lead and row_number preserves ordering so the
    // second window must NOT re-sort
    assert("Exchange".r.findAllIn(p).length <= 2,
      "SCD2 should shuffle twice (dedupe + windows), not per window")
    assert("\\(\\d+\\) Sort".r.findAllIn(p).isEmpty ||
      "Sort ".r.findAllIn(p).length <= 2, p)
  }

  test("scd2FromDeltas: latest-seq pick and lead window share one exchange") {
    import spark.implicits._
    // q109's fold (the streaming query's batch tail): the max_by-on-seq
    // aggregate and the lead window must both ride ONE hash partitioning
    // on key — the two-window form planned 2 Exchanges + 2 Sorts
    val deltas = Seq(
      (1L, 10L, 1, "open", """{"a":1}""", 1L),
      (1L, 20L, 0, "close", null, 2L),
      (2L, 10L, 1, "open", """{"a":2}""", 1L))
      .toDF("key", "tsMs", "version", "action", "rowJson", "seq")
    val schema = org.apache.spark.sql.types.StructType.fromDDL("a INT")
    val p = graft.streaming.StatefulVersions.scd2FromDeltas(deltas, schema)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 1, p)
    assert("Sort ".r.findAllIn(p).length <= 1, p)
  }

  test("q121: correlated LATERAL limit decorrelates to a ranked window join") {
    val p = graft.queries.BatchQueries.q121.fn(spark, sf001)
      .queryExecution.executedPlan.toString
    // the per-customer LIMIT 3 must become a window rank (ideally with
    // partition-local WindowGroupLimit) + equijoin — NOT a nested-loop
    // re-execution of the subquery per outer row
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("WindowGroupLimit") || p.contains("Window"), p)
  }

  test("q52: resample windows are partitioned by key, spine join is keyed") {
    val p = graft.queries.BatchQueries.q52.fn(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.forall(_.contains("user_id")),
      s"LOCF window must partition by user:\n${windows.mkString("\n")}")
  }

  test("no registered query plans an unpartitioned window over data") {
    import org.apache.spark.sql.catalyst.plans.logical.Window
    import graft.queries.{CdcQueries, StreamingQueries}
    // A Window with no partitionSpec funnels its whole input through one
    // task — a 10^8-row vocabulary becomes a single-task sort at corpus
    // scale (the q57 class of bug). Assert none survives to the optimized
    // plan of any registered query.
    //
    // NOTE on cost: q.fn is invoked for every non-exempt registered
    // query, and some fn bodies are EAGER (q57 runs its PageRank
    // iterations, q29 trains IVF centroids on first call — memoized
    // per dir), so this "plan inspection" executes real Spark jobs at
    // sf0.001. Acceptable today (~seconds); if the registry grows
    // expensive eager queries, share their DataFrames with other specs
    // or exempt them here with their shape pinned elsewhere.
    //
    // Skipped: streaming queries execute inside fn and return a sink
    // read, so the returned batch plan carries none of the streaming
    // computation — their shapes are pinned in StreamingSpec instead.
    // Exempt: q48's per-bucket offsets window runs over the bucket
    // relation (corpus/chunk rows — bounded metadata, documented at
    // CorpusOps.packShards and shape-checked in the q48 test above);
    // q136 composes packShards and inherits exactly that window.
    val streaming = (StreamingQueries.all :+ CdcQueries.q17f).map(_.name).toSet
    val exempt = Set("q48_shard_pack", "q136_shard_manifest")
    for (q <- SparkEntry.registry if !streaming(q.name) && !exempt(q.name)) {
      val df = q.fn(spark, sf001)
      // partitionBy(lit(1)) has the same single-task funnel as an empty
      // partitionSpec — flag windows whose spec is entirely foldable too
      val bad = df.queryExecution.optimizedPlan.collect {
        case w: Window if w.partitionSpec.forall(_.foldable) => w
      }
      assert(bad.isEmpty, s"${q.name}: global unpartitioned window over data")
      // q57's top-k cutoff must be the per-partition form
      if (q.name == "q57_textrank")
        assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
          "q57 top-k must plan as TakeOrderedAndProject")
    }
  }

  test("q67/q68/q76/q77: per-row text operators plan as zero-shuffle scans") {
    // PII redaction, the quality gate, chunk splitting, and winnowing
    // are pure map work — at 100 TB they must stay embarrassingly
    // parallel: no Exchange anywhere, and the scan must prune to the
    // columns the rules read
    for (q <- Seq(graft.queries.MandateQueries.q67,
                  graft.queries.PipelineQueries.q68,
                  graft.queries.PipelineQueries.q76,
                  graft.queries.MandateQueries.q77)) {
      val qe = q.fn(spark, sf001).queryExecution
      assert(!qe.executedPlan.toString.contains("Exchange"),
        s"${q.name}: map-only query must not shuffle")
    }
    val p = plan(graft.queries.PipelineQueries.q68.fn(spark, sf001))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("source") && !readSchema.contains("n_chars"),
      s"q68 reads only doc_id+text: $readSchema")
  }

  test("q74/q75: skew top-k is per-partition heaps; decayed sum is one keyed shuffle") {
    val p74 = graft.queries.PipelineQueries.q74.fn(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(p74.contains("TakeOrderedAndProject"),
      "heavy-key top-k must not plan as a global sort")
    val p75 = graft.queries.BatchQueries.q75.fn(spark, sf001)
      .queryExecution.executedPlan.toString
    // one shuffle on the key; the reference-time reduce is a 1-row broadcast
    assert("Exchange hashpartitioning".r.findAllIn(p75).length <= 1, p75)
  }

  test("q54: count-min sketch aggregates with map-side partial merge") {
    val p = graft.queries.PipelineQueries.q54.fn(spark, sf001)
      .queryExecution.executedPlan.toString
    // typed Aggregator under ObjectHashAggregate, partial + final pair
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("q90: span dedup reuses partitionings — bounded shuffles, no self-join blowup") {
    val p = graft.queries.PipelineQueries.q90.fn(spark, sf001)
      .queryExecution.executedPlan.toString
    // The whole pipeline (distinct pairs -> doc frequency -> occurrence
    // join-back -> doc window -> span merge -> per-doc agg -> final doc
    // join) must run in a bounded number of hash shuffles: the
    // join-back reuses the frequency shuffle's s-partitioning, and
    // everything downstream of the window reuses the id-partitioning
    // (groupBy(id, sid) and groupBy(id) satisfy ClusteredDistribution
    // under HashPartitioning(id)). A regression here is an extra
    // full-corpus exchange at 100 TB.
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 5, p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "span dedup must never plan an all-pairs join")
  }
}
