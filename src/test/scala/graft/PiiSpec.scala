package graft

import graft.ops.{Pii, TextAnalysis}
import org.apache.spark.sql.functions._

/** PII redaction and the quality gate: rule semantics pinned on
  * hand-built rows (the query-level fixture is oracle-checked; this
  * pins the operator contract itself).
  */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  test("pii: counts and redaction per rule, rule order protects emails from the IP rule") {
    val df = Seq(
      (1L, "mail a.b-c_d@sub.example.co and x@y.io, ip 192.168.0.1 call 555-0199"),
      (2L, "no pii here, just a version string 1.2 and a price 10.50"),
      (3L, "edge 999.999.999.999 is still ip-shaped; 555-12345 is five digits"))
      .toDF("id", "txt")
    val out = Pii.detectAndRedact(df, "txt").orderBy("id")
      .select("n_email", "n_ip", "n_phone", "clean").as[(Long, Long, Long, String)].collect()

    assert(out(0) == ((2L, 1L, 1L,
      "mail <EMAIL> and <EMAIL>, ip <IP> call <PHONE>")))
    // 1.2 / 10.50 are not 4-octet shapes; nothing matches
    assert(out(1) == ((0L, 0L, 0L,
      "no pii here, just a version string 1.2 and a price 10.50")))
    // rules are shape-based: 999.* matches (range validation is not the
    // rule's job), while the trailing \b rejects the 5-digit phone run
    assert(out(2)._2 == 1L && out(2)._3 == 0L)
    assert(out(2)._4 == "edge <IP> is still ip-shaped; 555-12345 is five digits")
  }

  test("pii: redaction is idempotent on the corpus fixture — clean text has zero residual matches") {
    val docs = Tables.documents(spark, sf001).select(col("doc_id"),
      concat(col("text"), lit(" u"), col("doc_id").cast("string"),
        lit("@ex.org at 10.0."), (col("doc_id") % 250).cast("string"),
        lit(".7 tel 555-0123")).as("txt"))
    val once = Pii.detectAndRedact(docs, "txt").select(col("doc_id"), col("clean").as("txt"))
    val twice = Pii.detectAndRedact(once, "txt")
    val residual = twice.agg(
      sum(col("n_email") + col("n_ip") + col("n_phone")).as("r")).as[Long].head()
    assert(residual == 0L, s"redacted text still matches $residual times")
  }

  test("quality gate: first failing rule wins, integer-only thresholds") {
    val df = Seq(
      (1L, Seq.fill(30)("w").zipWithIndex.map { case (w, i) => s"$w$i" }.mkString(" ")), // 30 distinct
      (2L, "short doc"),                         // too_short
      (3L, Seq.fill(40)("rep").mkString(" ")))   // 40 tokens, 1 distinct
      .toDF("id", "txt")
    val out = TextAnalysis.qualityFilter(df, "txt", 25, 30).orderBy("id")
      .select("n_tok", "n_distinct", "reason", "keep")
      .as[(Long, Long, String, Boolean)].collect()
    assert(out(0) == ((30L, 30L, "ok", true)))
    assert(out(1) == ((2L, 2L, "too_short", false)))
    assert(out(2) == ((40L, 1L, "repetitive", false)))
  }

  test("quality gate boundary: exactly at the thresholds keeps") {
    // n_tok = 25 exactly; ttr exactly 30%: 25 tokens, 8 distinct → 8*100=800 < 750? no: 8*100 >= 25*30=750 keeps
    val txt = ((0 until 8).map(i => s"t$i") ++ Seq.fill(17)("t0")).mkString(" ")
    val out = TextAnalysis.qualityFilter(Seq((1L, txt)).toDF("id", "txt"), "txt", 25, 30)
      .select("n_tok", "n_distinct", "keep").as[(Long, Long, Boolean)].head()
    assert(out == ((25L, 8L, true)))
    // one fewer distinct tips it: 7*100 = 700 < 750
    val txt2 = ((0 until 7).map(i => s"t$i") ++ Seq.fill(18)("t0")).mkString(" ")
    val out2 = TextAnalysis.qualityFilter(Seq((1L, txt2)).toDF("id", "txt"), "txt", 25, 30)
      .select("reason").as[String].head()
    assert(out2 == "repetitive")
  }
}
