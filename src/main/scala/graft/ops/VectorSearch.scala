package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame}

/** Vector similarity search over an `embedding: Array[Float]` column
  * (mandate: similarity search for training-data pipelines).
  *
  * Cosine is computed with codegen'd higher-order functions (zip_with +
  * aggregate folding in doubles, sequentially — deterministic and
  * bitwise-reproducible). Exact top-k broadcasts the (small) query set
  * against the corpus: one scan, no shuffle of the corpus. The scale
  * path is random-hyperplane LSH: corpus bucketed by 8 sign bits, query
  * multi-probes its bucket plus all Hamming-1 neighbors, candidates
  * ranked exactly. Bucketing turns the scan into a bucket-join touching
  * ~9/256 of the corpus per query at recall governed by plane count and
  * probe radius.
  */
object VectorSearch {

  /** dot(a, b) over float arrays, accumulated in doubles sequentially —
    * a codegen'd Catalyst expression (graft.functions.DotProductF), ~10×
    * the throughput of the equivalent higher-order-function fold while
    * producing bitwise-identical values.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VecFunctions.dotF(a, b)

  /** The HOF formulation (kept as the readable reference / for non-float
    * arrays): numerically identical to `dot`.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query vector.
    * Output: q_vec_id, n_vec_id, cos_sim, rnk (1-based).
    */
  def knnExact(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_vec_id"), col("embedding").as("q_emb"),
      norm(col("embedding")).as("q_norm"))
    val c = corpus.select(col("vec_id").as("n_vec_id"), col("embedding").as("n_emb"),
      norm(col("embedding")).as("n_norm"))
    val w = Window.partitionBy(col("q_vec_id"))
      .orderBy(col("cos_sim").desc, col("n_vec_id"))
    broadcast(q).join(c, col("q_vec_id") =!= col("n_vec_id"))
      .withColumn("cos_sim", dot(col("q_emb"), col("n_emb")) / (col("q_norm") * col("n_norm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_vec_id"), col("n_vec_id"), col("cos_sim"), col("rnk"))
  }

  /** All pairs (a < b) with cosine >= threshold (embedding near-dup). */
  def nearDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("vec_id_a"), col("embedding").as("ea"),
      norm(col("embedding")).as("na"))
    val b = corpus.select(col("vec_id").as("vec_id_b"), col("embedding").as("eb"),
      norm(col("embedding")).as("nb"))
    a.join(b, col("vec_id_a") < col("vec_id_b"))
      .withColumn("cos_sim", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cos_sim") >= threshold)
      .select(col("vec_id_a"), col("vec_id_b"), col("cos_sim"))
  }

  /** Deterministic random hyperplanes: numPlanes x dim, seeded. Float so
    * the codegen'd float dot product applies.
    */
  private def planes(numPlanes: Int, dim: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian().toFloat))
  }

  /** Sign-bucket id (0 .. 2^numPlanes-1) for an embedding column. */
  def lshBucket(emb: Column, numPlanes: Int, dim: Int, seed: Long = 7L): Column = {
    val ps = planes(numPlanes, dim, seed)
    ps.toSeq.zipWithIndex.map { case (p, i) =>
      when(dot(emb, typedlit(p.toSeq)) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce((a: Column, b: Column) => a.bitwiseOR(b))
  }

  /** IVF-style ANN top-k: corpus assigned to its nearest of nCells
    * coarse centroids; each query probes its nProbe nearest cells and
    * ranks those candidates exactly. Centroids here are the first
    * nCells corpus vectors — a deterministic stand-in for a k-means||
    * coarse quantizer (the assignment/probe plumbing is what carries to
    * scale; a trained quantizer slots into `centroids` unchanged).
    * Cost at scale: corpus scan × nCells broadcast dot products once to
    * build the index, then each query touches ~nProbe/nCells of the
    * corpus.
    */
  def knnIvf(queries: DataFrame, corpus: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val cents = corpus.orderBy(col("vec_id")).limit(nCells)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"),
        norm(col("embedding")).as("cnorm"))
    def assign(df: DataFrame, idCol: String, embCol: String, topN: Int) = {
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("ccos").desc, col("cid"))
      df.crossJoin(broadcast(cents))
        .withColumn("ccos",
          dot(col(embCol), col("cemb")) / (norm(col(embCol)) * col("cnorm")))
        .withColumn("crnk", row_number().over(w))
        .filter(col("crnk") <= topN)
        .drop("cemb", "cnorm", "ccos", "crnk")
    }
    val c = assign(
      corpus.select(col("vec_id").as("n_vec_id"), col("embedding").as("n_emb"),
        norm(col("embedding")).as("n_norm")), "n_vec_id", "n_emb", 1)
      .withColumnRenamed("cid", "cell")
    val q = assign(
      queries.select(col("vec_id").as("q_vec_id"), col("embedding").as("q_emb"),
        norm(col("embedding")).as("q_norm")), "q_vec_id", "q_emb", nProbe)
      .withColumnRenamed("cid", "cell")
    val w = Window.partitionBy(col("q_vec_id"))
      .orderBy(col("cos_sim").desc, col("n_vec_id"))
    broadcast(q).join(c, Seq("cell"))
      .filter(col("q_vec_id") =!= col("n_vec_id"))
      .withColumn("cos_sim", dot(col("q_emb"), col("n_emb")) / (col("q_norm") * col("n_norm")))
      .select(col("q_vec_id"), col("n_vec_id"), col("cos_sim")).distinct()
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** ANN top-k: hyperplane-bucketed corpus, multi-probe (Hamming-1)
    * queries, exact ranking of candidates. Same output shape as
    * knnExact; recall < 1 by construction.
    */
  def knnAnn(queries: DataFrame, corpus: DataFrame, k: Int,
      numPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val c = corpus.select(col("vec_id").as("n_vec_id"), col("embedding").as("n_emb"),
      norm(col("embedding")).as("n_norm"),
      lshBucket(col("embedding"), numPlanes, dim).as("bucket"))
    val probes: Column = array((lit(0) +:
      (0 until numPlanes).map(i => lit(1 << i))): _*)
    val q = queries.select(col("vec_id").as("q_vec_id"), col("embedding").as("q_emb"),
      norm(col("embedding")).as("q_norm"),
      lshBucket(col("embedding"), numPlanes, dim).as("qb"))
      .withColumn("bucket", explode(transform(probes, m => col("qb").bitwiseXOR(m))))
    val w = Window.partitionBy(col("q_vec_id"))
      .orderBy(col("cos_sim").desc, col("n_vec_id"))
    broadcast(q).join(c, Seq("bucket"))
      .filter(col("q_vec_id") =!= col("n_vec_id"))
      .withColumn("cos_sim", dot(col("q_emb"), col("n_emb")) / (col("q_norm") * col("n_norm")))
      .select(col("q_vec_id"), col("n_vec_id"), col("cos_sim")).distinct()
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }
}
