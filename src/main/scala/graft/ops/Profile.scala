package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Column profiler — the ANALYZE-style data-quality pass a 100 TB intake
  * pipeline runs before anything else: per column, row/null counts,
  * exact distinct cardinality, and min/max. One row out per column.
  *
  * Shape, chosen for scale:
  *  - counts + typed min/max come from ONE full-scan Aggregate with
  *    map-side partials and a single 1-row reduce — no shuffle of data,
  *    2×width aggregation buffers.
  *  - exact distinct counts go through an UNPIVOTED two-level aggregate:
  *    explode each row to (column, rendered value) and count twice,
  *    keyed by (column, value) then (column). This is the form that
  *    scales: N× `count(DISTINCT c)` in one Aggregate triggers Spark's
  *    Expand rewrite (N copies of every input row through one shuffle),
  *    while the unpivot shuffles each value once, partially aggregated.
  *    (At 100 TB you might swap exact for HLL per column — q13's
  *    operator — but the profiler's contract here is exact.)
  *
  * `render` maps each typed column to its canonical string form; it is
  * applied AFTER min/max (numeric min over strings would be
  * lexicographic and wrong) and BEFORE distinct (injective rendering
  * keeps the count exact).
  */
object Profile {

  /** Join-key skew diagnostic — the pass you run BEFORE deciding whether
    * a join needs [[Joins.saltedJoin]] / AQE skew hints: the k heaviest
    * keys with their corpus share, plus the global skew factor
    * (max key count / mean key count). One keyed count aggregate; the
    * top-k is `orderBy.limit` (plans as TakeOrderedAndProject — per-
    * partition heaps, never a global sort), and the global stats are a
    * broadcast 1-row reduce over the counts relation. All emitted
    * doubles are single divisions of exactly-counted integers.
    */
  def keySkew(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("_t"), count(lit(1)).as("_k"),
      max(col("cnt")).as("_m"))
    counts.orderBy(col("cnt").desc, col(keyCol)).limit(k)
      .crossJoin(broadcast(tot)) // 1-row global stats
      .select(col(keyCol), col("cnt"),
        (col("cnt").cast("double") / col("_t")).as("share"),
        ((col("_m") * col("_k")).cast("double") / col("_t")).as("skew_factor"))
  }

  /** columns: (name, typedCol, render) — render must be injective and
    * deterministic (it defines both the distinct-count domain and the
    * min/max display form).
    */
  def profile(df: DataFrame,
      columns: Seq[(String, Column, Column => Column)]): DataFrame = {
    // Pass 1: single-row aggregate — counts and typed extrema.
    val aggCols = columns.flatMap { case (n, c, _) =>
      Seq(count(c).as(s"nn_$n"), min(c).as(s"mn_$n"), max(c).as(s"mx_$n"))
    }
    val pass1 = df.agg(count(lit(1)).as("n_rows"), aggCols: _*)
      .select(col("n_rows"), explode(array(columns.map { case (n, _, render) =>
        struct(lit(n).as("cname"),
          (col("n_rows") - col(s"nn_$n")).as("n_nulls"),
          render(col(s"mn_$n")).as("min_val"),
          render(col(s"mx_$n")).as("max_val"))
      }: _*)).as("p"))
      .select(col("n_rows"), col("p.cname"), col("p.n_nulls"),
        col("p.min_val"), col("p.max_val"))
    // Pass 2: unpivot → two-level exact distinct count per column.
    val distincts = df
      .select(explode(array(columns.map { case (n, c, render) =>
        struct(lit(n).as("cname"), render(c).as("sval"))
      }: _*)).as("u"))
      .select(col("u.cname"), col("u.sval"))
      .where(col("sval").isNotNull)
      .groupBy(col("cname"), col("sval")).agg(count(lit(1)).as("_c"))
      .groupBy(col("cname")).agg(count(lit(1)).as("n_distinct"))
    // Left join: an all-null column has no row in `distincts` (the null
    // filter removes its every value) but must still profile — with
    // n_distinct = 0 — rather than vanish from the report.
    pass1.join(broadcast(distincts), Seq("cname"), "left") // |columns| rows each
      .select(col("cname"), col("n_rows"), col("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_val"), col("max_val"))
  }

  /** Population-stability-index drift report between a REFERENCE slice
    * (`isRef` true) and the rest — the standard pre-training check that
    * a new data batch still looks like the corpus a model was tuned on.
    * `features` maps a feature name to its BIN expression (a category
    * column as-is, a numeric column pre-bucketed); the report has one
    * row per (feature, bin) with both counts, the bin's PSI term
    * (p−q)·ln(p/q), and the feature's total PSI, with PSI ≥ 0.2 the
    * conventional act-on-it line.
    *
    * One scan (bins explode per row), one shuffle on (feature, bin),
    * then windows over the BIN relation — bounded by bins × features,
    * thousands of rows at any corpus size, so the windows cost nothing
    * and the report never returns to the data. Laplace-smoothed
    * proportions ((n+1)/(tot+nbins)) keep empty bins finite without a
    * clamp. Engine stability: p and q are exact rationals of integer
    * counts (identical doubles on any engine), each PSI term is a
    * per-row double (ulp-level engine agreement, the q42 ln rule), and
    * the feature total sums 1e-9-scaled INTEGER terms so its double is
    * bit-stable under any row order.
    */
  def psiDrift(df: DataFrame, isRef: Column,
      features: Seq[(String, Column)]): DataFrame = {
    val stacked = df
      .select(isRef.as("is_ref"), explode(array(features.map { case (n, c) =>
        struct(lit(n).as("feature"), c.cast("string").as("bin"))
      }: _*)).as("fb"))
      .select(col("is_ref"), col("fb.feature").as("feature"),
        col("fb.bin").as("bin"))
    psiFromCounts(stacked.groupBy(col("feature"), col("bin"))
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_cur")))
  }

  /** The PSI report from a PRE-COUNTED (feature, bin, n_ref, n_cur)
    * relation — the histogram-level entry point a MAINTAINED monitor
    * feeds (q137: the current-side histogram folds from a CDC delta
    * log, so drift is re-scored per batch without ever rescanning the
    * corpus). Same smoothing/stability arithmetic as [[psiDrift]],
    * which now routes through here.
    */
  def psiFromCounts(counts: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("feature"))
    counts
      .withColumn("nb", count(lit(1)).over(w))
      .withColumn("tot_ref", sum(col("n_ref")).over(w))
      .withColumn("tot_cur", sum(col("n_cur")).over(w))
      .withColumn("p", (col("n_ref") + 1).cast("double") /
        (col("tot_ref") + col("nb")).cast("double"))
      .withColumn("q", (col("n_cur") + 1).cast("double") /
        (col("tot_cur") + col("nb")).cast("double"))
      .withColumn("psi_term", (col("p") - col("q")) * log(col("p") / col("q")))
      .withColumn("psi_feature",
        sum(round(col("psi_term") * 1e9).cast("long")).over(w).cast("double") / 1e9)
      .select(col("feature"), col("bin"), col("n_ref"), col("n_cur"),
        col("psi_term"), col("psi_feature"))
  }

  /** What a breached expectation DOES to the batch it judged — the
    * enforcement half of the rule engine (the reference's error-
    * isolation intent, S6: a failing record must not silently reach
    * consumers, and must not take down the healthy rest either):
    *  - [[Warn]]   record the verdict row, serve the batch unchanged
    *               (pure monitoring — the pre-r11 behavior).
    *  - [[Drop]]   violating ROWS dead-letter before the serving write;
    *               every violating row is withheld regardless of budget
    *               (the budget tolerates verdict FAILURES, it never
    *               licenses serving a known-bad row), and the verdict
    *               row still records the exact count.
    *  - [[Halt]]   violations beyond budget quarantine the pipeline
    *               ([[HaltException]] fails the micro-batch, exactly as
    *               a malformed conf edit does) — the store keeps its
    *               pre-batch state, and the checkpoint replays the batch
    *               once the data (or the rule) is fixed.
    */
  sealed trait Action extends Serializable
  case object Warn extends Action
  case object Drop extends Action
  case object Halt extends Action

  /** A halt-action rule breached its budget: the micro-batch must fail
    * (pipeline quarantine), leaving the serving store at its pre-batch
    * state for checkpoint replay after the fix.
    */
  final class HaltException(val pipeline: String, val batchId: Long,
      val rule: String, val violations: Long, val budget: Long)
    extends RuntimeException(
      s"pipeline $pipeline batch $batchId: expectation '$rule' halts — " +
        s"$violations violations > budget $budget")

  /** The construction-time invariants every pipeline kind shares, in
    * ONE place (five ctors apply it; the registry adds its file-named
    * variants): declared expectations need a metrics target (verdicts
    * without a store vanish silently), and a Drop action needs a
    * dead-letter dir (withheld rows without a landing place vanish too
    * — S6: failures are data).
    */
  def requireEnforceable(kind: String, name: String,
      expectations: Seq[Rule], metrics: Option[_],
      deadLetterDir: Option[String]): Unit = {
    require(expectations.isEmpty || metrics.isDefined,
      s"$kind $name: expectations need a metrics target to record into")
    require(expectations.forall(_.action != Drop) || deadLetterDir.isDefined,
      s"$kind $name: a drop-action expectation needs a deadLetterDir")
  }

  /** The extra invariant ADDITIVE stores (± contribution folds — the
    * search index's signed tf/len merges) impose on Drop rules: a
    * withheld contribution is not overwritten by the next batch, it is
    * MISSING from a running sum, so the drop verdict for a document
    * must be IDENTICAL at its insert and at its later retraction or
    * the fold corrupts (an InRange rule on tf would withhold a +5
    * insert yet pass the -5 retraction, driving the stored tf
    * negative; a Unique verdict depends on the batch's other rows, so
    * the same doc can pass one batch and fail the next). Enforced at
    * registration, the fail-fast seam (S3): Drop rules must be
    * per-row-deterministic predicates over the STABLE doc identity
    * column — NotNull/InRange/RefIntegrity* on `idColumn`, never
    * Unique. (Referential rules additionally need their dimension
    * pinned for the store's lifetime — the pipeline snapshots it under
    * its work root at first batch.)
    */
  def requireStableAdditiveDropRules(kind: String, name: String,
      rules: Seq[Rule], idColumn: String): Unit =
    rules.filter(_.action == Drop).foreach { r =>
      require(!r.isInstanceOf[Unique],
        s"$kind $name: drop rule '${r.name}' is Unique — its verdict " +
          "depends on the batch's other rows, which is unstable across " +
          "a doc's insert/retraction pair on an additive store")
      require(r.column == idColumn,
        s"$kind $name: drop rule '${r.name}' judges column " +
          s"'${r.column}' — on an additive store drop verdicts must be " +
          s"stable across a doc's insert/retraction pair, so only the " +
          s"doc identity column '$idColumn' is allowed")
    }

  /** A declared data-quality expectation. Rules are TYPED literals, not
    * SQL strings (the q69 lesson: declared pipeline logic that reaches
    * an execution plan must be structured data, never interpolated
    * text). `budget` is the violation count the rule tolerates; a rule
    * passes iff violations <= budget — integer arithmetic end to end,
    * so verdicts are engine-exact. `action` is what a breach does to
    * the judged batch ([[Action]]).
    */
  sealed trait Rule {
    def name: String; def column: String; def budget: Long
    def action: Action
  }
  /** Violations = rows where `column` is null. */
  final case class NotNull(name: String, column: String,
      budget: Long = 0L, action: Action = Warn) extends Rule
  /** Violations = rows beyond the first per value of `column` (nulls
    * count as one shared value — null-cardinality policing belongs to
    * [[NotNull]]).
    */
  final case class Unique(name: String, column: String,
      budget: Long = 0L, action: Action = Warn) extends Rule
  /** Violations = NON-NULL rows outside [lo, hi] (nulls are
    * [[NotNull]]'s concern, mirroring SQL's null-excluding filters).
    */
  final case class InRange(name: String, column: String, lo: Double,
      hi: Double, budget: Long = 0L, action: Action = Warn) extends Rule
  /** Violations = NON-NULL `column` values with no match in
    * `dim.dimColumn` — foreign-key conformance against a dimension.
    */
  final case class RefIntegrity(name: String, column: String,
      dim: DataFrame, dimColumn: String, budget: Long = 0L,
      action: Action = Warn) extends Rule
  /** [[RefIntegrity]] with the dimension as a PARQUET PATH + key column
    * — the conf-expressible form (a conf can declare a path; it cannot
    * declare a DataFrame), resolved against the judged frame's session
    * at evaluation. Registration validates the path reads and carries
    * the key column, so a typo'd conf dies at boot naming file + field.
    */
  final case class RefIntegrityPath(name: String, column: String,
      dimPath: String, dimColumn: String, budget: Long = 0L,
      action: Action = Warn) extends Rule

  private def refDim(df: DataFrame, r: Rule): (DataFrame, String) = r match {
    case r: RefIntegrity => (r.dim, r.dimColumn)
    case r: RefIntegrityPath =>
      (df.sparkSession.read.parquet(r.dimPath), r.dimColumn)
    case other =>
      throw new IllegalArgumentException(s"not a referential rule: $other")
  }

  /** DATA-QUALITY EXPECTATIONS — the declared-constraint verdict pass
    * (Deequ-style) an intake pipeline gates on: one row per rule with
    * its exact violation count, declared budget, and pass verdict.
    *
    * Shape, chosen for scale: every scalar rule (NotNull/InRange)
    * reduces in ONE shared full-scan Aggregate (map-side partials, one
    * 1-row reduce — adding a scalar rule costs one aggregation buffer
    * slot, never a scan). Uniqueness is a per-rule keyed count (its
    * group-by key differs per rule and mixing count(DISTINCT)s into one
    * Aggregate triggers the Expand rewrite — the q13 lesson), and
    * referential integrity is a per-rule left-anti count against the
    * dimension's distinct keys (broadcast when small, shuffle join
    * otherwise — Catalyst/AQE decides). All counts are integers; the
    * verdict is violations <= budget.
    */
  def expectations(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "expectations needs at least one rule")
    val scalar = rules.collect {
      case r: NotNull => (r.name, r.budget,
        sum(when(col(r.column).isNull, 1L).otherwise(0L)))
      case r: InRange => (r.name, r.budget,
        sum(when(col(r.column).isNotNull &&
          !(col(r.column) >= r.lo && col(r.column) <= r.hi), 1L)
          .otherwise(0L)))
    }
    val scalarRows = if (scalar.isEmpty) Seq.empty[DataFrame] else Seq {
      val agg = df.agg(scalar.head._3.as("v0"),
        scalar.tail.zipWithIndex.map { case ((_, _, c), i) =>
          c.as(s"v${i + 1}")
        }: _*)
      agg.select(explode(array(scalar.zipWithIndex.map {
        case ((n, b, _), i) =>
          struct(lit(n).as("rule"),
            coalesce(col(s"v$i"), lit(0L)).as("violations"),
            lit(b).as("budget"))
      }: _*)).as("r")).select(col("r.*"))
    }
    val keyed = rules.collect {
      case r: Unique =>
        df.groupBy(col(r.column)).agg(count(lit(1)).as("_c"))
          .agg(coalesce(sum(col("_c") - 1L), lit(0L)).as("violations"))
          .select(lit(r.name).as("rule"), col("violations"),
            lit(r.budget).as("budget"))
      case r @ (_: RefIntegrity | _: RefIntegrityPath) =>
        val (dim, dimColumn) = refDim(df, r)
        df.filter(col(r.column).isNotNull)
          .join(dim.select(col(dimColumn).as(r.column)).distinct(),
            Seq(r.column), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(r.name).as("rule"), col("violations"),
            lit(r.budget).as("budget"))
    }
    (scalarRows ++ keyed).reduce(_ unionByName _)
      .withColumn("pass", col("violations") <= col("budget"))
  }

  /** Tag every row of `df` with the names of the rules it violates —
    * the PER-ROW form of [[expectations]] that [[Drop]] enforcement
    * runs on (a verdict can only count; withholding needs the rows).
    * Adds a `violated` array<string> column; a clean row's array is
    * empty. Counting parity with [[expectations]] is load-bearing and
    * spec-pinned: the number of tagged rows per rule equals that rule's
    * aggregate violation count (NotNull/InRange tag per-row predicates;
    * Unique tags every row beyond the first per value — rows ranked by
    * `tieBreak`, which callers pass as the serving frame's primary key
    * so the survivor is deterministic; referential rules tag left-anti
    * misses).
    *
    * Scale shape: scalar tags are codegen'd per-row expressions (zero
    * extra passes); each Unique rule costs one window shuffle on its
    * column; each referential rule one left join against the
    * dimension's distinct keys (broadcast when small — AQE decides).
    */
  def tagViolations(df: DataFrame, rules: Seq[Rule],
      tieBreak: Seq[String]): DataFrame = {
    require(rules.nonEmpty, "tagViolations needs at least one rule")
    val uniqueRules = rules.collect { case r: Unique => r }
    require(uniqueRules.isEmpty || tieBreak.nonEmpty,
      "a Unique drop rule needs a tieBreak key to pick the surviving row")
    var acc = df
    val tagCols = scala.collection.mutable.ArrayBuffer.empty[Column]
    rules.foreach {
      case r: NotNull =>
        tagCols += when(col(r.column).isNull, lit(r.name))
      case r: InRange =>
        tagCols += when(col(r.column).isNotNull &&
          !(col(r.column) >= r.lo && col(r.column) <= r.hi), lit(r.name))
      case r: Unique =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(r.column)).orderBy(tieBreak.map(col): _*)
        val m = s"__uq_${r.name}"
        acc = acc.withColumn(m, row_number().over(w) > 1)
        tagCols += when(col(m), lit(r.name))
      case r @ (_: RefIntegrity | _: RefIntegrityPath) =>
        val (dim, dimColumn) = refDim(df, r)
        val m = s"__ref_${r.name}"
        // distinct dim keys → at most one match, so multiplicity holds
        acc = acc.join(
          dim.select(col(dimColumn).as(r.column)).distinct()
            .withColumn(m, lit(true)),
          Seq(r.column), "left")
        tagCols += when(col(r.column).isNotNull && col(m).isNull, lit(r.name))
    }
    // re-select the ORIGINAL column order (+ violated): the referential
    // joins move their join column first, and callers feed the clean
    // remainder straight to sinks that are order-sensitive (to_json)
    acc
      .withColumn("violated",
        array_compact(array(tagCols.toSeq: _*)).cast("array<string>"))
      .select((df.columns.toSeq :+ "violated").map(col): _*)
  }
}
