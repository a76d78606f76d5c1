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

  /** C4-style quality GATE (the filter itself, downstream of the
    * [[qualityFeatures]] surface): appends per-row verdict columns —
    * `n_tok`, `n_distinct`, `reason` (FIRST failing rule, or 'ok') and
    * `keep`. Rules are integer-only comparisons (`minTtrPct` is the
    * type-token-ratio floor in percent, checked as
    * n_distinct*100 < n_tok*pct), so the verdict never hinges on float
    * rounding and is bitwise-identical across engines. Per-row map-side
    * work: one scan, zero shuffles at any corpus size.
    */
  def qualityFilter(df: DataFrame, textCol: String, minTokens: Int,
      minTtrPct: Int): DataFrame = {
    val tokens = split(col(textCol), " ")
    df.withColumn("n_tok", size(tokens).cast("long"))
      .withColumn("n_distinct", size(array_distinct(tokens)).cast("long"))
      .withColumn("reason",
        when(col("n_tok") < minTokens, "too_short")
          .when(col("n_distinct") * 100 < col("n_tok") * minTtrPct, "repetitive")
          .otherwise("ok"))
      .withColumn("keep", col("reason") === "ok")
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
    * order-dependent float accumulation).
    *
    * Shape at scale: every signal is a function of ONE document's token
    * array, so the whole computation is per-row — one scan, zero
    * shuffles — through the fused RepetitionStatsF kernel (one codegen'd
    * hash pass per document; see its scaladoc for why neither the
    * HOF-compositional per-row form nor the previous explode→aggregate
    * form is acceptable: the first interprets a lambda per gram, the
    * second shuffles ~3× the corpus to compute row-local arithmetic).
    *
    * Docs with fewer than 3 tokens emit no row (they have no trigram),
    * matching the oracle's inner joins across the three gram orders.
    */
  def repetitionSignals(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    val st = graft.functions.TextFunctions.repetitionStats(toks)
    docs
      .filter(size(toks) >= 3) // no trigram → no row (oracle inner join)
      .select(col(idCol).as("doc_id"), st.as("st"))
      .select(col("doc_id"),
        (lit(1.0) - col("st.nd1").cast("double") / col("st.nt1"))
          .as("dup_token_frac"),
        (col("st.mx2").cast("double") * 2 / (col("st.n2") + 1))
          .as("top_bigram_frac"),
        (lit(1.0) - col("st.nd3").cast("double") / col("st.n3"))
          .as("dup_trigram_frac"))
  }

  /** Unigram-LM negative-log-likelihood score — the perplexity-proxy
    * quality signal (the CCNet recipe scores documents with a language
    * model and keeps the low-perplexity band; a unigram model is its
    * engine-native, training-free form). Add-half smoothing:
    * nll(token) = −ln((cnt + 0.5) / (N + 0.5·V)). High avg_nll marks
    * rare-token soup (gibberish/OCR noise), low marks degenerate
    * repetition of frequent tokens.
    *
    * Shape at scale: the model (vocabulary→nll) is vocabulary-sized —
    * aggregated once, then BROADCAST back to the corpus token stream,
    * so the corpus-side join shuffles nothing; the only corpus shuffle
    * is the final per-doc aggregate (map-side partial avg). Natural-
    * language vocabulary grows ~O(corpus^0.5) (Heaps' law), so the
    * broadcast stays small at 100 TB.
    */
  def unigramLogProb(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("token"))
    val tf = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val totals = tf.agg(sum(col("cnt")).as("n"), count(lit(1)).as("v"))
    val model = tf.crossJoin(broadcast(totals)) // 1-row totals
      .select(col("token"),
        (-log((col("cnt") + 0.5) / (col("n") + lit(0.5) * col("v")))).as("nll"))
    toks.join(broadcast(model), Seq("token"))
      .groupBy(col("doc_id"))
      .agg(avg(col("nll")).as("avg_nll"),
        count(lit(1)).cast("long").as("n_tokens"))
  }

  /** Bigram-LM negative-log-likelihood — the conditional companion of
    * [[unigramLogProb]] (one Markov order up the CCNet recipe):
    * nll(w1 w2) = −ln((c(w1,w2) + 0.5) / (c1(w1) + 0.5·V)) with
    * c1(w1) = occurrences of w1 as a bigram head and V = distinct
    * second tokens (the prediction space). Scores context fit, not just
    * token rarity — shuffled word soup that passes a unigram model
    * scores high here.
    *
    * Shape at scale: the model is bigram-TYPE-sized (Heaps-sublinear
    * but larger than the vocabulary), so the corpus-side score join is
    * a plain keyed equijoin — AQE converts it to broadcast when the
    * model fits, and it degrades to a shuffle join (not an OOM) when a
    * 100 TB corpus's bigram table does not.
    */
  def bigramLogProb(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val bg = Shingles.tokenShinglesRaw(docs, idCol, textCol, 2)
    val cb = bg.groupBy(col("s")).agg(count(lit(1)).as("cb"))
    val parts = cb.withColumn("w1", split(col("s"), " ")(0))
      .withColumn("w2", split(col("s"), " ")(1))
    val c1 = parts.groupBy(col("w1")).agg(sum(col("cb")).cast("double").as("c1"))
    val v = parts.agg(count_distinct(col("w2")).cast("double").as("v"))
    val model = parts.join(c1, "w1").crossJoin(broadcast(v)) // 1-row total
      .select(col("s"),
        (-log((col("cb") + 0.5) / (col("c1") + lit(0.5) * col("v")))).as("nll"))
    bg.join(model, "s")
      .groupBy(col("id"))
      .agg(avg(col("nll")).as("avg_nll"), count(lit(1)).cast("long").as("n_bigrams"))
      .select(col("id").as("doc_id"), col("avg_nll"), col("n_bigrams"))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS local
    * fingerprinting algorithm): hash every k-token gram with the
    * engine-portable rolling hash (q33's formula), slide a w-wide
    * window over the gram-hash sequence, and select each window's
    * minimum — the selected set is a position-robust document signature
    * (any match of length ≥ w+k−1 tokens shares a fingerprint, the
    * winnowing guarantee) at ~2/(w+1) the gram density.
    *
    * Shape at scale: both passes are per-row higher-order expressions
    * (grams → window minima) over one scan — no shuffle, no UDF; the
    * only relational work is the final explode. Output: (doc_id, fp),
    * the distinct selected fingerprints per document.
    */
  def winnow(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("t"))
      .filter(size(col("t")) >= k + w - 1) // at least one full window
      .withColumn("g", expr(
        s"transform(sequence(0, size(t) - $k), i -> " +
          s"aggregate(sequence(0, ${k - 1}), CAST(0 AS BIGINT), (a, j) -> " +
          "(a * 1000003 + CAST(ascii(element_at(t, i + j + 1)) * 131 " +
          "+ length(element_at(t, i + j + 1)) AS BIGINT)) % 2147483647))"))
      .select(col("doc_id"), explode(expr(
        s"array_distinct(transform(sequence(0, size(g) - $w), i -> " +
          s"array_min(slice(g, i + 1, $w))))")).as("fp"))
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
