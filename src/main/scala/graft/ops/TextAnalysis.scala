package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Text-analysis operators for training-data pipelines (mandate):
  * language ID, quality scoring, token counting, fingerprinting. All are
  * single-pass, codegen'd expressions over the text column — no UDFs —
  * so they vectorize and scale linearly with corpus bytes.
  */
object TextAnalysis {

  /** Per-language marker stopword lists for the n-gram/stopword-ratio
    * language heuristic. Deliberately tiny: the point is the operator
    * shape (argmax over marker-hit counts), not lexicon quality.
    */
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "y", "los"),
    "fr" -> Seq("le", "les", "des", "et", "une"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  private def hits(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isin(words: _*)))

  /** Predicted language: argmax of marker hits, ties broken by the
    * `markers` order, no hits at all → "und".
    */
  def langId(textCol: Column): Column = {
    val tokens = split(textCol, " ")
    val scores = markers.map { case (lang, words) => lang -> hits(tokens, words) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, score), elseCol) =>
      when(score === best && score > 0, lit(lang)).otherwise(elseCol)
    }
  }

  /** Quality features: token count, mean token length, stopword ratio,
    * and an n_chars consistency check.
    */
  def qualityFeatures(df: DataFrame, textCol: String, nCharsCol: String): DataFrame = {
    val tokens = split(col(textCol), " ")
    val nTok = size(tokens).cast("long")
    val en = markers.head._2
    df.withColumn("n_tokens", nTok)
      .withColumn("avg_token_len",
        (length(col(textCol)) - (nTok - 1)).cast("double") / nTok)
      .withColumn("stopword_ratio", hits(tokens, en).cast("double") / nTok)
      .withColumn("len_valid", length(col(textCol)).cast("long") === col(nCharsCol))
  }

  /** Repetition-based quality signals (the Gopher-rules family — Rae et
    * al. 2021 §A1.1 — re-grounded on token streams): excessive internal
    * repetition is the strongest single predictor of machine-generated /
    * boilerplate junk in web-scale corpora. Emitted per document:
    *
    *  - `dup_token_frac`    1 − distinct/total tokens
    *  - `dup_trigram_frac`  1 − distinct/total token 3-grams
    *  - `top_bigram_frac`   occurrences of the most frequent 2-gram ×
    *                        2 / total tokens (fraction of token slots
    *                        the dominant bigram accounts for)
    *
    * All three are ratios of exactly-counted integers computed in one
    * division each, so they are bitwise-stable across engines (no
    * order-dependent float accumulation). Shape at scale: one explode
    * per n-gram order into a keyed (doc, gram) hash aggregate, then a
    * per-doc aggregate — every step partitioned by doc_id, no windows,
    * no driver collection.
    */
  def repetitionSignals(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    // guard: sequence(0, -1) would count DOWN (Spark picks step -1),
    // producing out-of-range element_at indices on docs shorter than n
    // tokens — emit no grams instead (matching SQL range() semantics),
    // which drops the doc from the inner joins on both engines alike
    def grams(n: Int): Column =
      if (n == 1) toks
      else when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
        .otherwise(array())
    def stats(n: Int, distinctFracName: String, topFracName: Option[String]) = {
      val perGram = docs
        .select(col(idCol).as("doc_id"), explode(grams(n)).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("nd"), sum(col("c")).as("nt"), max(col("c")).as("mx"))
      val base = perGram.select(col("doc_id"),
        (lit(1.0) - col("nd").cast("double") / col("nt")).as(distinctFracName),
        col("mx"), col("nt"))
      topFracName match {
        case Some(f) => base.select(col("doc_id"), col(distinctFracName),
          (col("mx").cast("double") * 2 / (col("nt") + 1)).as(f))
        case None => base.select(col("doc_id"), col(distinctFracName))
      }
    }
    val uni = stats(1, "dup_token_frac", None)
    val tri = stats(3, "dup_trigram_frac", None)
    val bi = stats(2, "_bi_dup", Some("top_bigram_frac")).drop("_bi_dup")
    uni.join(bi, Seq("doc_id")).join(tri, Seq("doc_id"))
  }

  /** Whitespace token count and BPE-ish regex token count. */
  def tokenCounts(textCol: Column): (Column, Column) = (
    size(split(textCol, " ")).cast("long"),
    size(regexp_extract_all(textCol, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long"))

  /** Rolling-hash document fingerprint: fold (acc*1000003 + e) mod 2^31-1
    * over per-token features e = ascii(first char)*131 + token length.
    * Order-sensitive (it is a ROLLING hash), deterministic, and
    * expressible in any engine with a sequential list fold.
    */
  def fingerprint(textColName: String): Column =
    expr(s"aggregate(transform(split($textColName, ' '), " +
      "t -> CAST(ascii(t) * 131 + length(t) AS BIGINT)), " +
      "CAST(0 AS BIGINT), (a, e) -> (a * 1000003 + e) % 2147483647)")

  /** Top-k tokens by frequency for a slice of the corpus. */
  def topTokens(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)
}
