package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Corpus-level training-data pipeline operators (mandate, beyond the
  * pairwise dedup family): duplicate-CLUSTER resolution, TF-IDF term
  * relevance, benchmark decontamination, deterministic dataset splits,
  * and stopword scrubbing.
  *
  * These close the loop a real 100 TB curation pipeline needs: near-dup
  * PAIRS (MinHashLsh / SimHash / VectorSearch) are only half the story —
  * the pipeline must then resolve pairs into clusters, keep one canonical
  * document per cluster, hold out eval data by n-gram overlap, and split
  * the survivors reproducibly.
  */
object CorpusOps {

  /** Connected components over an undirected pair graph — resolves
    * near-dup pairs into duplicate clusters. Output: (doc_id,
    * cluster_id, is_canonical) for every doc that appears in a pair,
    * where cluster_id is the minimum doc_id of the component (the
    * deterministic survivor, matching Dedup.keepMinBy's convention).
    *
    * Algorithm: min-label propagation (the Pregel/GraphX formulation as
    * plain DataFrame joins) — label(x) ← min(label(x), min over
    * neighbours' labels), iterated to fixpoint. Each round is one
    * shuffle (join on dst + groupBy src); rounds needed = component
    * diameter, which for near-dup clusters is tiny (dups of a common
    * original). Labels are materialized per round via localCheckpoint to
    * truncate the growing lineage (a reliable checkpoint dir does the
    * same on a cluster); the convergence probe aggregates to ONE scalar
    * per round — no data is ever collected to the driver.
    */
  def dupClusters(pairs: DataFrame): DataFrame = {
    val edges = pairs
      .select(col("doc_id_a").as("src"), col("doc_id_b").as("dst"))
      .union(pairs.select(col("doc_id_b").as("src"), col("doc_id_a").as("dst")))
      .persist()
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
      .localCheckpoint(true)
    var changed = 1L
    while (changed > 0) {
      val nbrMin = edges.as("e")
        .join(labels.as("l"), col("e.dst") === col("l.id"))
        .groupBy(col("e.src").as("id")).agg(min(col("l.lbl")).as("nbr"))
      val next = labels.select(col("id"), col("lbl").as("olbl"))
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), least(col("olbl"), coalesce(col("nbr"), col("olbl"))).as("lbl"),
          col("olbl"))
        .localCheckpoint(true)
      // labels only ever decrease, so this counts this round's changes
      changed = next.filter(col("lbl") < col("olbl")).count()
      labels = next.drop("olbl")
    }
    edges.unpersist()
    labels.select(col("id").as("doc_id"), col("lbl").as("cluster_id"),
      (col("id") === col("lbl")).as("is_canonical"))
  }

  /** Top-k terms per document by TF-IDF (tf × ln(N/df)).
    *
    * Ranking is by an integer-scaled score key, round(score × 1e9):
    * mathematically-tied scores reached by different arithmetic
    * (e.g. tf=2,idf=ln 10 vs tf=1,idf=ln 100) can differ in the last
    * ulp and differ BETWEEN engines, so ranking raw doubles makes the
    * top-k cutoff a coin flip against the oracle. The integer key makes
    * the order (and the tie-break by token) engine-independent; the
    * reported score column stays the exact double.
    *
    * Shape at scale: one explode + two hash aggregations (tf, df) + a
    * shuffle join on token + one window per doc — every step keyed and
    * partitionable; df (vocabulary) is the only global structure and is
    * joined, never collected.
    */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("token"))
    val tf = toks.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n"))
    val scored = tf.join(df, "token").crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") * log(col("n").cast("double") / col("df")))
      .withColumn("skey", round(col("score") * 1e9).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("skey").desc, col("token"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("token"), col("score"), col("rnk"))
  }

  /** Benchmark decontamination: flag every candidate document sharing at
    * least one n-token shingle with the eval set. The semi-join stops at
    * the first matching shingle per doc — no counts are materialized —
    * and when the eval side is small Spark broadcasts it, so the corpus
    * is touched exactly once with no shuffle.
    */
  def contaminated(candidates: DataFrame, evalDocs: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val evalShingles = Shingles.tokenShingles(evalDocs, idCol, textCol, n)
      .select(col("s")).distinct()
    val candShingles = Shingles.tokenShingles(candidates, idCol, textCol, n)
    candShingles.join(evalShingles, Seq("s"), "left_semi")
      .select(col("id").as(idCol)).distinct()
  }

  /** Deterministic train/val/test split by multiplicative integer hash
    * (Knuth 2654435761 mod 2^32) of the id — reproducible across runs,
    * engines, and partitionings, unlike rand()-based sampling, and
    * expressible in plain integer SQL so an external system can compute
    * the identical split. Boundaries: [0,.8) train, [.8,.9) val,
    * [.9,1) test of the 2^32 hash space.
    *
    * The id is reduced mod 2^30 BEFORE the multiply: a raw id × 2^31.3
    * multiplier overflows signed 64-bit for ids above ~3.5e9 (reachable
    * in a 100 TB corpus) — an ANSI-mode runtime error in Spark 4 and
    * DuckDB, a silent wrap otherwise. (2^30−1)·2654435761 < 2^62 keeps
    * every intermediate in range in ANY engine evaluating the same SQL.
    */
  private def knuthHash(id: Column, multiplier: Long): Column =
    pmod(pmod(id, lit(1073741824L)) * lit(multiplier), lit(4294967296L))

  def hashSplit(df: DataFrame, idCol: String): DataFrame = {
    val h = knuthHash(col(idCol), 2654435761L)
    df.withColumn("split",
      when(h < lit(3435973837L), "train")
        .when(h < lit(3865470566L), "val")
        .otherwise("test"))
  }

  /** Stopword scrub: remove the given tokens from the text, reporting
    * how many were dropped. Pure codegen'd array functions (split /
    * filter / array_join) — single pass, no UDF, no shuffle.
    */
  def removeStopwords(docs: DataFrame, textCol: String,
      stopwords: Seq[String]): DataFrame = {
    val stop = typedlit(stopwords)
    val toks = split(col(textCol), " ")
    val kept = filter(toks, t => !array_contains(stop, t))
    docs.withColumn("clean_text", array_join(kept, " "))
      .withColumn("n_removed", (size(toks) - size(kept)).cast("long"))
  }

  /** Deterministic stratified sampling: keep a row iff its id-hash falls
    * below the stratum's rate threshold in the 2^32 hash space. Same
    * reproducibility story as [[hashSplit]] — no rand(), identical
    * result on any engine/partitioning — but with a DIFFERENT odd
    * multiplier (xxHash's prime32_2), so the sample is decorrelated from
    * the train/val/test split: sampling with the split's own hash would
    * silently sample only from fixed split regions.
    */
  def stratifiedSample(df: DataFrame, idCol: String, rate: Column): DataFrame = {
    val h = knuthHash(col(idCol), 2246822519L)
    df.filter(h < rate * lit(4294967296L))
  }

  /** Token-budget shard packing: documents (in id order) are laid end to
    * end and cut into shards of ~`budget` weight — the training-shard
    * assembly step of a data pipeline (weight = token count). shard_id =
    * floor(prefix_weight_before / budget).
    *
    * A naive `sum() OVER (ORDER BY id)` global-order window funnels the
    * corpus through ONE partition; this is the classic two-phase
    * parallel prefix sum instead: ids are chunked (`chunk` consecutive
    * ids per bucket), per-bucket totals make a tiny relation whose
    * running sum is windowed on a single partition of #buckets ROWS
    * (metadata, not data — choose chunk so corpus/chunk ≈ 1e5 rows at
    * your scale), and each bucket's offset joins back (broadcast) to an
    * intra-bucket window partitioned BY bucket. All integer arithmetic —
    * the shard boundary never hinges on float rounding.
    */
  def packShards(docs: DataFrame, idCol: String, weight: Column,
      budget: Long, chunk: Long = 1024): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val base = docs.select(col(idCol), weight.cast("long").as("w"),
      floor(col(idCol) / chunk).cast("long").as("_bkt"))
    val offs = base.groupBy(col("_bkt")).agg(sum(col("w")).as("bw"))
      .withColumn("_off", coalesce(
        sum(col("bw")).over(
          W.orderBy(col("_bkt")).rowsBetween(W.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("_bkt"), col("_off"))
    val before = coalesce(
      sum(col("w")).over(
        W.partitionBy(col("_bkt")).orderBy(col(idCol))
          .rowsBetween(W.unboundedPreceding, -1)),
      lit(0L)) + col("_off")
    base.join(broadcast(offs), Seq("_bkt"))
      .withColumn("_before", before)
      // exact-multiple double division is exact; stay integral anyway
      .withColumn("shard_id",
        ((col("_before") - pmod(col("_before"), lit(budget))) / budget).cast("long"))
      .select(col(idCol), col("w").as("n_tokens"), col("shard_id"))
  }

  /** Inverted index build: token → ascending posting list of documents
    * containing it (+ document frequency). One explode + one hash
    * aggregate; postings are emitted as a CSV string (bounded by corpus
    * here — a production index would chunk hot tokens' postings into
    * fixed-size blocks, which is this same query windowed by
    * row_number() DIV blocksize).
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // no pre-distinct: collect_set deduplicates (map-side too, in the
    // ObjectHashAggregate partial), so a distinct() here would shuffle
    // the exploded corpus — the largest intermediate — a second time
    docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("token"))
      .groupBy(col("token"))
      .agg(sort_array(collect_set(col("doc_id"))).as("_p"))
      .select(col("token"), array_join(col("_p"), ",").as("postings"),
        size(col("_p")).cast("long").as("df"))
  }
}
