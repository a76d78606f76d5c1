package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** MinHash + LSH banding near-duplicate detection — the 100 TB path for
  * Q19's exact shingle-join (SURVEY §4.2.3).
  *
  * Pipeline: shingle → murmur3 hash → 64 universal-hash permutations →
  * per-doc min signature → 16 bands of 4 rows → band-hash bucket join →
  * exact Jaccard verify on the (tiny) candidate set.
  *
  * Cost shape: signatures are one hash aggregate over (doc, shingle);
  * candidate generation shuffles only (band, bandHash) pairs — 16 rows
  * per doc regardless of doc length — and the exact verify runs on the
  * candidates only, not all O(n²) pairs. With b=16, r=4 the probability
  * of missing a pair at Jaccard 0.9 is (1-0.9^4)^16 ≈ 4e-8, so on data
  * whose true pairs sit well above the 0.6 threshold the result equals
  * the exact formulation (which is how the oracle checks it).
  */
object MinHashLsh {

  private val Prime = 2147483647L // 2^31 - 1

  /** Deterministic universal-hash coefficients (seeded, build-time). */
  private def coeffs(numPerms: Int, seed: Long): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPerms)((rnd.nextInt(Int.MaxValue - 1).toLong + 1,
      rnd.nextInt(Int.MaxValue).toLong))
  }

  /** MinHash signature per id: numPerms min-agg columns sig0..sigN. */
  def signatures(shingles: DataFrame, numPerms: Int = 64, seed: Long = 42L): DataFrame = {
    // (kept as the standalone signature builder; the scaled path uses
    // docState, which fuses this aggregate with the shingle-set collect)
    val cs = coeffs(numPerms, seed)
    // murmur3 of the shingle, lifted to non-negative
    val h = (hash(col("s")).cast("long") + 2147483648L).as("h")
    val withH = shingles.select(col("id"), h)
    // reduce h (< 2^32) mod Prime BEFORE multiplying: both factors then
    // fit in 31 bits so the product stays < 2^62 — the unreduced form
    // overflowed Long for large h*a, wrapping negative and breaking the
    // universal-hash uniformity the banding miss-probability relies on
    val mins: Seq[Column] = cs.toSeq.zipWithIndex.map { case ((a, b), i) =>
      min(((col("h") % Prime) * a + b) % Prime).as(s"sig$i")
    }
    withH.groupBy(col("id")).agg(mins.head, mins.tail: _*)
  }

  /** Candidate pairs (id_a < id_b) sharing at least one LSH band. */
  def candidatePairs(sigs: DataFrame, bands: Int = 16, rows: Int = 4): DataFrame = {
    val bandCols: Seq[Column] = (0 until bands).map { bIdx =>
      val parts = (0 until rows).map(r => col(s"sig${bIdx * rows + r}"))
      hash(parts: _*).as(s"band$bIdx")
    }
    val banded = sigs.select(col("id") +: bandCols: _*)
      .select(col("id"), explode(array((0 until bands).map(bIdx =>
        struct(lit(bIdx).as("b"), col(s"band$bIdx").as("v"))): _*)).as("bd"))
      .select(col("id"), col("bd.b").as("b"), col("bd.v").as("v"))
    val l = banded.select(col("id").as("doc_id_a"), col("b"), col("v"))
    val r = banded.select(col("id").as("doc_id_b"), col("b"), col("v"))
    l.join(r, Seq("b", "v")).filter(col("doc_id_a") < col("doc_id_b"))
      .select(col("doc_id_a"), col("doc_id_b")).distinct()
  }

  /** Per-doc state for the one-pass scaled path: the full (distinct)
    * shingle set as an array PLUS the numPerms signature mins, from a
    * SINGLE hash aggregate over the exploded shingles. Shingle sets per
    * doc are bounded by doc length, so the row stays small at any corpus
    * size.
    */
  def docState(shingles: DataFrame, numPerms: Int = 64, seed: Long = 42L): DataFrame = {
    val cs = coeffs(numPerms, seed)
    val h = (hash(col("s")).cast("long") + 2147483648L).as("h")
    val withH = shingles.select(col("id"), col("s"), h)
    val mins: Seq[Column] = cs.toSeq.zipWithIndex.map { case ((a, b), i) =>
      min(((col("h") % Prime) * a + b) % Prime).as(s"sig$i")
    }
    withH.groupBy(col("id"))
      .agg(collect_set(col("s")).as("ss"), mins: _*)
  }

  /** Full scaled near-dup: band candidates, then exact-Jaccard verify.
    *
    * One-pass shape: [[docState]] computes the shingle SET and the
    * signature in a single aggregate, so the verify stage is two hash
    * joins on the candidate ids plus an array_intersect — the exploded
    * shingle relation is never revisited and the `candidates` subtree
    * appears exactly once in the plan. (The earlier formulation routed
    * verify through a doc-restricted shingle self-join; that referenced
    * the candidate subtree three times — union a/b + final semi-join —
    * tripling the banding work.) doc state is persisted: candidate
    * generation and both verify sides read one cached build of the
    * aggregate.
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, threshold: Double): DataFrame =
    nearDupPairsFromShingles(
      Shingles.tokenShingles(docs, idCol, textCol, shingleN), threshold)

  /** Same scaled path over ANY (id, s) shingle relation — token and
    * character shingles emit the identical schema, so tokenizer-free
    * char-gram near-dup (q58's domain) reuses this unchanged. Banding
    * parameters are tunable per operating point: bands*rows minhash
    * permutations; P(candidate | jaccard j) = 1 - (1 - j^rows)^bands.
    * The defaults (16×4) fit true-pair similarity ≥ 0.9 over a sparse
    * background; char grams over a small shared vocabulary have a
    * DENSER background (~0.2-0.3), so that caller raises `rows` (e.g.
    * 12×6: background 0.3 collides at 0.9% while a 0.93 dup still
    * misses with p < 4e-6 per pair).
    */
  def nearDupPairsFromShingles(sh: DataFrame, threshold: Double,
      bands: Int = 16, rows: Int = 4, seed: Long = 42L): DataFrame =
    nearDupPairsFromShinglesManaged(sh, threshold, bands, rows, seed)._1

  /** [[nearDupPairsFromShingles]] plus a release hook for the internal
    * doc-state cache. The lazy form's cache lives until the session
    * ends (Spark's CacheManager dedupes the same plan, so repeated
    * builds hold ONE copy per input — bounded, but never freed); an
    * eager caller that finishes its terminal action should call
    * `release()` to hand the memory back.
    */
  def nearDupPairsFromShinglesManaged(sh: DataFrame, threshold: Double,
      bands: Int = 16, rows: Int = 4, seed: Long = 42L): (DataFrame, () => Unit) = {
    val byDoc = docState(sh, numPerms = bands * rows, seed = seed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = candidatePairs(byDoc, bands = bands, rows = rows)
    val a = byDoc.select(col("id").as("doc_id_a"), col("ss").as("ssa"))
    val b = byDoc.select(col("id").as("doc_id_b"), col("ss").as("ssb"))
    val pairs = cands.join(a, Seq("doc_id_a")).join(b, Seq("doc_id_b"))
      .withColumn("c", size(array_intersect(col("ssa"), col("ssb"))).cast("long"))
      .withColumn("jac",
        col("c").cast("double") / (size(col("ssa")) + size(col("ssb")) - col("c")))
      .filter(col("jac") >= threshold)
      .select(col("doc_id_a"), col("doc_id_b"), col("jac"))
    (pairs, () => { byDoc.unpersist(); () })
  }
}
