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
