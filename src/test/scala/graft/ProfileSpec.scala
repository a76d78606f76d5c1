package graft

import org.apache.spark.sql.functions._
import graft.ops.{CorpusOps, Profile}

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: counts, nulls, exact distinct, typed min/max") {
    val df = Seq[(java.lang.Long, String)](
      (3L, "b"), (1L, "a"), (10L, "a"), (null, "c"), (10L, null)
    ).toDF("k", "v")
    val asStr: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      _.cast("string")
    val out = Profile.profile(df, Seq(
      ("k", col("k"), asStr), ("v", col("v"), identity)))
      .orderBy("cname")
      .as[(String, Long, Long, Long, String, String)].collect()
    // min/max must be numeric, not lexicographic: min=1, max=10 (a
    // string min would give "1", max "3")
    assert(out(0) == ("k", 5L, 1L, 3L, "1", "10"))
    assert(out(1) == ("v", 5L, 1L, 3L, "a", "c"))
  }

  test("profile: all-null column keeps its row (n_distinct = 0); empty input profiles too") {
    val asStr: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      _.cast("string")
    val df = Seq[(java.lang.Long, String)]((1L, null), (2L, null)).toDF("k", "v")
    val out = Profile.profile(df, Seq(
      ("k", col("k"), asStr), ("v", col("v"), identity)))
      .orderBy("cname")
      .as[(String, Long, Long, Long, String, String)].collect()
    // the all-null column must appear — a data-quality report that
    // silently omits exactly the broken column is worse than none
    assert(out(1) == ("v", 2L, 2L, 0L, null, null))
    assert(out(0) == ("k", 2L, 0L, 2L, "1", "2"))
    val empty = Profile.profile(df.limit(0), Seq(("k", col("k"), asStr)))
      .as[(String, Long, Long, Long, String, String)].collect()
    assert(empty.toSeq == Seq(("k", 0L, 0L, 0L, null, null)))
  }

  test("dupNgramStats: shared shingles counted, unique-only doc scores 0") {
    val docs = Seq(
      (1L, "w x y z q a b c"),   // shares "w x y z q" with doc 2
      (2L, "w x y z q d e f"),
      (3L, "p q r s t u v w")    // nothing shared
    ).toDF("doc_id", "text")
    val out = CorpusOps.dupNgramStats(docs, "doc_id", "text", 5)
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect()
    assert(out(0)._2 == 4 && out(1)._2 == 4 && out(2)._2 == 4)
    assert(out(0)._3 == 0.25 && out(1)._3 == 0.25 && out(2)._3 == 0.0)
  }

  test("psiDrift: identical mixes net zero; a swapped-out category crosses the 0.2 act line") {
    // same category mix on both sides → p = q per bin → every term and
    // the feature total are exactly zero
    val same = Seq((true, "a"), (true, "a"), (true, "b"), (true, "b"),
      (false, "a"), (false, "a"), (false, "b"), (false, "b"))
      .toDF("ref", "t")
    val z = Profile.psiDrift(same, col("ref"), Seq("cat" -> col("t")))
      .as[(String, String, Long, Long, Double, Double)].collect()
    assert(z.length == 2)
    assert(z.forall(r => r._5 == 0.0 && r._6 == 0.0))

    // reference is a/b, current is all-c: every bin one-sided; the
    // Laplace smoothing keeps terms finite and the total far over 0.2
    val shifted = Seq((true, "a"), (true, "a"), (true, "b"), (true, "b"),
      (false, "c"), (false, "c"), (false, "c"), (false, "c"))
      .toDF("ref", "t")
    val s = Profile.psiDrift(shifted, col("ref"), Seq("cat" -> col("t")))
      .as[(String, String, Long, Long, Double, Double)].collect()
      .map(r => r._2 -> r).toMap
    assert(s.keySet === Set("a", "b", "c"))
    assert(s("a")._3 == 2 && s("a")._4 == 0)
    assert(s("c")._3 == 0 && s("c")._4 == 4)
    assert(s.values.forall(r => !r._5.isInfinite && !r._5.isNaN))
    assert(s("a")._6 > 0.2 && s.values.map(_._6).toSet.size == 1)

    // two features stay independent: a drifting feature must not bleed
    // into a stable one's total
    val two = Profile.psiDrift(shifted, col("ref"),
      Seq("stable" -> lit("x"), "cat" -> col("t")))
      .as[(String, String, Long, Long, Double, Double)].collect()
    val stable = two.filter(_._1 == "stable")
    assert(stable.length == 1 && stable.head._6 == 0.0)
    assert(two.filter(_._1 == "cat").head._6 > 0.2)
  }

  test("expectations: rule semantics at the null/duplicate edges, budget verdicts") {
    // k: one null (NotNull viol 1), value 5 twice + null-as-one-value
    //   → Unique violations = rows − groups = 5 − 4... k values:
    //   5, 5, 7, null, 9 → groups {5, 7, 9, null} → violations 1... but
    //   Unique counts the NULL group too, so a second null would add 1.
    // v: 50 outside [0, 10] (InRange viol 1; the null v row is exempt).
    // fk: 99 not in dim (RefIntegrity viol 1; the null fk row exempt).
    val df = Seq[(java.lang.Long, java.lang.Double, java.lang.Long)](
      (5L, 1.0, 1L), (5L, 2.0, 2L), (7L, 50.0, 99L), (null, null, null),
      (9L, 3.0, 1L)).toDF("k", "v", "fk")
    val dim = Seq(1L, 2L).toDF("id")
    val out = Profile.expectations(df, Seq(
      Profile.NotNull("k_not_null", "k"),
      Profile.Unique("k_unique", "k"),
      Profile.InRange("v_0_10", "v", 0.0, 10.0),
      Profile.InRange("v_0_10_budget1", "v", 0.0, 10.0, budget = 1L),
      Profile.RefIntegrity("fk_in_dim", "fk", dim, "id")))
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("k_not_null") == ((1L, 0L, false)))
    assert(out("k_unique") == ((1L, 0L, false)))
    assert(out("v_0_10") == ((1L, 0L, false)))
    assert(out("v_0_10_budget1") == ((1L, 1L, true))) // within budget
    assert(out("fk_in_dim") == ((1L, 0L, false)))
  }

  test("expectations: all-pass on clean data, and empty-input counts are zero") {
    val df = Seq((1L, 2.0), (2L, 3.0)).toDF("k", "v")
    val out = Profile.expectations(df, Seq(
      Profile.NotNull("k_not_null", "k"),
      Profile.Unique("k_unique", "k"),
      Profile.InRange("v_range", "v", 0.0, 10.0)))
      .as[(String, Long, Long, Boolean)].collect()
    assert(out.length == 3 && out.forall(r => r._2 == 0L && r._4))
    val empty = Profile.expectations(df.filter(col("k") < 0), Seq(
      Profile.NotNull("k_not_null", "k"),
      Profile.Unique("k_unique", "k")))
      .as[(String, Long, Long, Boolean)].collect()
    assert(empty.length == 2 && empty.forall(r => r._2 == 0L && r._4))
  }
}
