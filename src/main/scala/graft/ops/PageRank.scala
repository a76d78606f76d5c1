package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an edge list as plain DataFrame joins — the iterative
  * graph-analytics counterpart of [[CorpusOps.dupClusters]]'s label
  * propagation. Applied to a token co-occurrence graph this is TextRank,
  * the classic unsupervised keyword-extraction step of a corpus
  * pipeline.
  *
  * Each iteration is one join (ranks onto edges) + one aggregate
  * (contributions per destination) — both keyed and partitionable; rank
  * state is re-materialized per round via localCheckpoint (a reliable
  * checkpoint dir on a cluster) to truncate lineage, exactly the
  * dupClusters pattern. No data ever collects to the driver.
  *
  * Determinism: per-destination contribution sums run in FIXED POINT
  * (1e-15 grain into DECIMAL(38,0)) — a double sum would carry
  * partitioning-dependent ulp noise that compounds across iterations
  * and could reorder near-tied ranks run-to-run.
  *
  * Callers pass a graph where every node has at least one out-edge
  * (e.g. a symmetrized co-occurrence graph); dangling-mass
  * redistribution is deliberately out of scope and documented.
  */
object PageRank {

  private val Grain = 1e15

  /** @param edges (src, dst) directed edge list (deduplicated)
    * @return (node, rank), Σ rank = 1 for dangling-free graphs
    */
  def ranks(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    // materialize the edge list ONCE: it is referenced by every
    // iteration's join, and an unmaterialized edge plan (e.g. a shingle
    // scan) would re-derive from source each round — measured 3× the
    // whole loop's cost on the TextRank graph
    val e = edges.localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val n = nodes.count().toDouble
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("out"))
      .localCheckpoint(true)
    var rank = nodes.withColumn("rank", lit(1.0 / n))
    var it = 0
    while (it < iters) {
      val contribs = e
        .join(rank.withColumnRenamed("node", "src"), Seq("src"))
        .join(outDeg, Seq("src"))
        .select(col("dst").as("node"), (col("rank") / col("out")).as("c"))
        .groupBy(col("node"))
        .agg((sum(floor(col("c") * Grain + 0.5).cast("decimal(38,0)"))
          .cast("double") / Grain).as("in_sum"))
      rank = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("in_sum"), lit(0.0))).as("rank"))
      it += 1
      // lineage doubles per round — truncate every 3rd iteration (and on
      // exit) instead of every round: materialization is a job, and a
      // ≤8× plan between cuts parses fine
      if (it % 3 == 0 || it == iters) rank = rank.localCheckpoint(true)
    }
    rank
  }

  /** TextRank keyword scores: PageRank over the symmetrized
    * adjacent-token co-occurrence graph of a corpus.
    */
  def textRank(docs: DataFrame, textCol: String, iters: Int = 10): DataFrame = {
    val pairs = Shingles.tokenShingles(docs, idCol = docs.columns.head,
      textCol = textCol, n = 2)
      .select(split(col("s"), " ").as("p"))
      .select(element_at(col("p"), 1).as("src"), element_at(col("p"), 2).as("dst"))
      .filter(col("src") =!= col("dst"))
    val sym = pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    ranks(sym, iters)
  }
}
