package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper
import graft.cdc.Subscription
import graft.sinks.EsSink
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType
import java.io.File
import scala.jdk.CollectionConverters._

/** Config-driven pipeline registration — the reference's script
  * discovery (S1: ScriptContainer.java:35-58 lists a scripts dir and
  * registers each one; initCDC() declares db/table subscriptions)
  * re-expressed as data instead of code: one JSON file per pipeline in
  * a conf directory.
  *
  * Conf format (one object per `*.json` file):
  * {{{
  *   { "name": "orders",
  *     "databases": ["shop"], "tables": ["orders"],
  *     "idKey": "o_orderkey",
  *     "schema": "o_orderkey BIGINT, o_orderstatus STRING" }
  * }}}
  * plus an optional per-conf `"es": { "url", "username", "password" }`
  * serving target (see [[effectiveCfg]] — without it the runner's
  * default url/auth apply, re-keyed to the conf's idKey).
  *
  * Hot reload (S2) is deliberately restart-based, per SURVEY §2.2 S2:
  * streaming queries cannot swap their plan mid-flight, so the faithful
  * analog is [[changedSince]] → stop the affected query → [[load]] →
  * start again from its checkpoint (offsets preserve the cursor; the
  * 500 ms debounce machinery of WatchFile.java dissolves into whatever
  * schedules the restart).
  */
object PipelineRegistry {

  final case class Entry(pipeline: CdcPipeline, file: String, mtime: Long,
      target: Option[EsSink.Config] = None)

  /** The sink config an lww entry actually serves through. The
    * reference passes url/username/password/idKey PER CALL from each
    * script (ElasticsearchUtils.java:106-118) — targets are per
    * pipeline, never process-global. A conf may declare its own
    * `"es"` target; one that does not inherits the runner's default
    * url/auth but ALWAYS serves under its own declared idKey: the sink
    * extracts the document id via `cfg.idKey`, so a process-global
    * idKey would break (or silently mis-key) every conf whose id
    * column is named differently.
    */
  def effectiveCfg(e: Entry, default: EsSink.Config): EsSink.Config =
    e.target.getOrElse(default.copy(idKey = e.pipeline.idKey))

  /** Checkpoint directory key for a registered conf: derived from the
    * CONF FILE (the registration unit), not the pipeline name — two
    * confs that (mis)share a name must not share a checkpoint (two
    * concurrent queries on one checkpoint location corrupt the
    * offset/commit logs; Structured Streaming forbids it), and a conf
    * that renames its pipeline keeps its cursor. Conf basenames are
    * unique within the watched dir by construction.
    */
  def ckptKey(confFile: String): String =
    new File(confFile).getName.stripSuffix(".json")
      .replaceAll("[^A-Za-z0-9._-]", "_")

  private def confFiles(dir: String): Seq[File] =
    Option(new File(dir).listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.isFile && f.getName.endsWith(".json")).sortBy(_.getName).toSeq

  /** Recognized pipeline kinds. Anything else fails fast WITH the file
    * name (register-at-boot contract, S3): a typo'd `"kind": "veiw"`
    * must not make a production pipeline silently vanish from every
    * lifecycle.
    */
  private val Kinds = Set("lww", "view", "ann", "dedup", "search")

  private def kindOf(f: File,
      node: com.fasterxml.jackson.databind.JsonNode): String = {
    val k = if (node.hasNonNull("kind")) node.get("kind").asText() else "lww"
    require(Kinds(k),
      s"${f.getName}: unrecognized pipeline kind '$k' (expected one of ${Kinds.mkString(", ")})")
    k
  }

  /** The conf file's CURRENT kind, read leniently: None when the file
    * is gone, unparseable, or carries an unrecognized kind. The
    * lifecycle scan path runs on this — a malformed conf dropped into
    * the dir mid-run must quarantine itself, not abort the whole
    * watcher cycle (boot keeps the fail-fast [[kindOf]]). Memoized by
    * (path → (mtime, length)): one pollOnce asks "what kind is this
    * file" ~2x per registered kind, and re-parsing identical JSON ten
    * times per 500 ms tick is pure waste. Keying on length TOO narrows
    * the same-mtime staleness window — a file rewritten within the
    * filesystem's mtime granularity usually changes size as well.
    * Entries for files deleted from a scanned dir are evicted during
    * [[confFilesOfKind]] scans, so a long-lived watcher process does
    * not accumulate dead paths forever.
    */
  private val kindCache =
    new java.util.concurrent.ConcurrentHashMap[String, ((Long, Long), Option[String])]()

  private def lenientKindOf(f: File): Option[String] = {
    val stamp = (f.lastModified(), f.length())
    val cached = kindCache.get(f.getAbsolutePath)
    if (cached != null && cached._1 == stamp) cached._2
    else {
      val k = scala.util.Try {
        val node = new ObjectMapper().readTree(f)
        if (node.hasNonNull("kind")) node.get("kind").asText() else "lww"
      }.toOption.filter(Kinds)
      kindCache.put(f.getAbsolutePath, (stamp, k))
      k
    }
  }

  /** Drop cache entries for files under `dir` that no longer exist —
    * called from every kind-scoped scan, which already holds the dir's
    * live listing. Test-visible via [[kindCacheKeys]].
    */
  private def evictDeleted(dir: String, live: Set[String]): Unit = {
    val prefix = new File(dir).getAbsolutePath + File.separator
    kindCache.keySet().removeIf(p => p.startsWith(prefix) && !live(p))
    ()
  }

  /** Cached conf paths (lifecycle-leak regression tests). */
  private[graft] def kindCacheKeys: Set[String] =
    kindCache.keySet().asScala.toSet

  /** Parse a conf's optional `"transform"` node into an
    * [[ExprTransform]] — the R12 data-declared per-event reshape:
    * {{{
    *   "transform": { "set": [ { "field": "v", "expr": "upper(row.v)" },
    *                           { "field": "src", "expr": "'cdc'" } ],
    *                  "drop": [ "internal_note" ] }
    * }}}
    * Construction parses every expression through Catalyst, so a
    * typo'd conf fails HERE — at registration — not in the first
    * micro-batch (S3).
    */
  private def parseTransform(f: File,
      node: com.fasterxml.jackson.databind.JsonNode): Option[ExprTransform] =
    if (!node.hasNonNull("transform")) None
    else {
      val t = node.get("transform")
      val sets =
        if (!t.hasNonNull("set")) Nil
        else t.get("set").elements().asScala.map { s =>
          require(s.hasNonNull("field") && s.hasNonNull("expr"),
            s"${f.getName}: each transform set entry needs field and expr")
          (s.get("field").asText(), s.get("expr").asText())
        }.toSeq
      val drops =
        if (!t.hasNonNull("drop")) Nil
        else t.get("drop").elements().asScala.map(_.asText()).toSeq
      require(sets.nonEmpty || drops.nonEmpty,
        s"${f.getName}: transform declares neither set nor drop entries")
      try Some(ExprTransform(sets, drops))
      catch {
        case e: org.apache.spark.sql.catalyst.parser.ParseException =>
          throw new IllegalArgumentException(
            s"${f.getName}: invalid transform expression — ${e.getMessage}")
      }
    }

  /** Conf-declared per-pipeline metrics target, shared by all five
    * kinds:
    * {{{
    *   "metrics": { "url": "jdbc:derby:...", "table": "pipeline_metrics" }
    * }}}
    * The table is ENSURED at registration ([[PipelineMetrics.ensureTable]])
    * so an unreachable metrics store fails the conf at boot (S3), while
    * per-batch write failures at runtime only log (monitoring must not
    * take down the monitored — see [[PipelineMetrics.record]]).
    */
  private def parseMetrics(f: File,
      node: com.fasterxml.jackson.databind.JsonNode): Option[PipelineMetrics.Target] =
    if (!node.hasNonNull("metrics")) None
    else {
      val m = node.get("metrics")
      require(m.hasNonNull("url") && m.hasNonNull("table"),
        s"${f.getName}: metrics needs url and table")
      val t = PipelineMetrics.Target(m.get("url").asText(),
        m.get("table").asText())
      try PipelineMetrics.ensureTable(t)
      catch {
        case e: java.sql.SQLException =>
          throw new IllegalArgumentException(
            s"${f.getName}: metrics store unreachable — ${e.getMessage}")
      }
      Some(t)
    }

  /** Conf-declared per-batch DATA-QUALITY EXPECTATIONS (q149's typed
    * rule engine riding the serving path):
    * {{{
    *   "expectations": [
    *     {"rule": "not_null", "name": "id_set",   "column": "o_orderkey"},
    *     {"rule": "unique",   "name": "id_unique","column": "o_orderkey"},
    *     {"rule": "in_range", "name": "price_ok", "column": "o_totalprice",
    *      "lo": 0, "hi": 300000, "budget": 5, "action": "drop"},
    *     {"rule": "ref_integrity", "name": "cust_known",
    *      "column": "o_custkey",
    *      "dim": {"path": "/data/customer.parquet",
    *              "keyColumn": "c_custkey"}}
    *   ]
    * }}}
    * Validation is REGISTRATION-TIME (the ExprTransform precedent): an
    * unknown rule kind, a missing field, or a column absent from the
    * pipeline's OUTGOING serving schema (the declared schema as
    * reshaped by the conf's transform — a transform that drops a
    * declared column must not leave an expectation that throws in every
    * micro-batch) fails the conf naming file + field — never the first
    * drained batch. Expectations also require a `metrics` target (the
    * verdict store); the pipeline ctors enforce that too.
    * `ref_integrity` declares its dimension as a parquet path + key
    * column, validated HERE (the path must read and carry the column).
    * `action` is what a breach does to the judged batch
    * ([[graft.ops.Profile.Action]]): `warn` (default) records only,
    * `drop` dead-letters violating rows before the serving write
    * (requires a conf-declared `deadLetterDir`), `halt` quarantines the
    * pipeline when violations exceed budget.
    */
  private def parseExpectations(f: File,
      node: com.fasterxml.jackson.databind.JsonNode,
      schema: org.apache.spark.sql.types.StructType): Seq[graft.ops.Profile.Rule] =
    if (!node.hasNonNull("expectations")) Nil
    else node.get("expectations").elements().asScala.map { e =>
      def str(field: String): String = {
        require(e.hasNonNull(field),
          s"${f.getName}: expectation needs '$field'")
        e.get(field).asText()
      }
      val budget = if (e.hasNonNull("budget")) e.get("budget").asLong() else 0L
      val action =
        if (!e.hasNonNull("action")) graft.ops.Profile.Warn
        else e.get("action").asText() match {
          case "warn" => graft.ops.Profile.Warn
          case "drop" => graft.ops.Profile.Drop
          case "halt" => graft.ops.Profile.Halt
          case other => throw new IllegalArgumentException(
            s"${f.getName}: unknown expectation action '$other' " +
              "(expected warn, drop or halt)")
        }
      val column = str("column")
      require(schema.fieldNames.contains(column),
        s"${f.getName}: expectation column '$column' is not in the " +
          s"pipeline's serving schema (${schema.fieldNames.mkString(", ")})")
      str("rule") match {
        case "not_null" =>
          graft.ops.Profile.NotNull(str("name"), column, budget, action)
        case "unique" =>
          graft.ops.Profile.Unique(str("name"), column, budget, action)
        case "in_range" =>
          require(e.hasNonNull("lo") && e.hasNonNull("hi"),
            s"${f.getName}: in_range expectation needs lo and hi")
          graft.ops.Profile.InRange(str("name"), column,
            e.get("lo").asDouble(), e.get("hi").asDouble(), budget, action)
        case "ref_integrity" =>
          require(e.hasNonNull("dim"),
            s"${f.getName}: ref_integrity expectation needs a dim object")
          val d = e.get("dim")
          require(d.hasNonNull("path") && d.hasNonNull("keyColumn"),
            s"${f.getName}: ref_integrity dim needs path and keyColumn")
          val (path, keyCol) = (d.get("path").asText(), d.get("keyColumn").asText())
          // registration-time read of the dimension's schema: a typo'd
          // path or key column dies at boot naming file + field
          SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
            .foreach { sp =>
              val dimSchema =
                try sp.read.parquet(path).schema
                catch {
                  case ex: org.apache.spark.sql.AnalysisException =>
                    throw new IllegalArgumentException(
                      s"${f.getName}: ref_integrity dim path '$path' " +
                        s"does not read — ${ex.getMessage}")
                }
              require(dimSchema.fieldNames.contains(keyCol),
                s"${f.getName}: ref_integrity dim keyColumn '$keyCol' is " +
                  s"not in $path (have ${dimSchema.fieldNames.mkString(", ")})")
            }
          graft.ops.Profile.RefIntegrityPath(str("name"), column, path,
            keyCol, budget, action)
        case other => throw new IllegalArgumentException(
          s"${f.getName}: unknown expectation rule '$other'")
      }
    }.toSeq

  /** [[parseExpectations]] plus the store-side registration work every
    * kind shares: declared rules REQUIRE a metrics target (verdicts
    * without a store would vanish silently), a `drop` action REQUIRES a
    * dead-letter dir (withheld rows without a landing place would
    * vanish too — S6: failures are data), and the sibling verdict table
    * is ensured at load (register-at-boot, S3).
    */
  private def parseExpectationsWithStore(f: File,
      node: com.fasterxml.jackson.databind.JsonNode,
      schema: org.apache.spark.sql.types.StructType,
      metricsTarget: Option[PipelineMetrics.Target],
      deadLetterDir: Option[String] = None): Seq[graft.ops.Profile.Rule] = {
    val rules = parseExpectations(f, node, schema)
    if (rules.nonEmpty) {
      require(metricsTarget.isDefined,
        s"${f.getName}: expectations need a metrics target to record into")
      require(rules.forall(_.action != graft.ops.Profile.Drop)
          || deadLetterDir.isDefined,
        s"${f.getName}: a drop-action expectation needs a deadLetterDir " +
          "for the withheld rows")
      metricsTarget.foreach(PipelineMetrics.ensureExpectTable)
    }
    rules
  }

  /** Conf-declared schema-drift monitoring/enforcement, shared by ALL
    * FIVE kinds (R7's streaming analog — r12 parsed it for lww only; a
    * drifting embeddings or fact/dim wire was invisible to the other
    * kinds' stores):
    * {{{
    *   "driftCheck": true,
    *   "driftPolicy": { "newColsBudget": 0, "badTypeRowsBudget": 0,
    *                    "action": "drop" }
    * }}}
    * Same invariants as expectations (register-at-boot, S3): a verdict
    * needs a metrics store, a Drop needs a deadLetterDir, and the
    * `_drift` verdict table is ensured at load.
    */
  private def parseDrift(f: File,
      node: com.fasterxml.jackson.databind.JsonNode,
      dlDir: Option[String],
      metricsTarget: Option[PipelineMetrics.Target])
      : (Boolean, Option[CdcPipeline.DriftPolicy]) = {
    val drift = node.hasNonNull("driftCheck") &&
      node.get("driftCheck").asBoolean()
    val driftPol = if (!node.hasNonNull("driftPolicy")) None
      else Some(parseDriftPolicy(f, "driftPolicy",
        node.get("driftPolicy"), dlDir))
    if (drift || driftPol.isDefined) {
      require(metricsTarget.isDefined,
        s"${f.getName}: driftCheck needs a metrics target to record into")
      metricsTarget.foreach(PipelineMetrics.ensureDriftTable)
    }
    (drift, driftPol)
  }

  /** One declared drift policy object — shared between the conf-level
    * `"driftPolicy"` and the view kind's per-side
    * `"fact"/"dim".driftPolicy` overrides; `owner` names the declaring
    * key in error messages.
    */
  private def parseDriftPolicy(f: File, owner: String,
      p: com.fasterxml.jackson.databind.JsonNode,
      dlDir: Option[String]): CdcPipeline.DriftPolicy = {
    val action =
      if (!p.hasNonNull("action")) graft.ops.Profile.Warn
      else p.get("action").asText() match {
        case "warn" => graft.ops.Profile.Warn
        case "drop" => graft.ops.Profile.Drop
        case "halt" => graft.ops.Profile.Halt
        case other => throw new IllegalArgumentException(
          s"${f.getName}: unknown $owner action '$other' " +
            "(expected warn, drop or halt)")
      }
    require(action != graft.ops.Profile.Drop || dlDir.isDefined,
      s"${f.getName}: a drop-action $owner needs a deadLetterDir")
    CdcPipeline.DriftPolicy(
      newColsBudget = if (p.hasNonNull("newColsBudget"))
        p.get("newColsBudget").asLong() else Long.MaxValue,
      badTypeRowsBudget = if (p.hasNonNull("badTypeRowsBudget"))
        p.get("badTypeRowsBudget").asLong() else Long.MaxValue,
      action = action)
  }

  /** Conf-declared dead-letter retention, shared by all five kinds:
    * `"deadLetterRetentionMs": N` ages out quarantined rows on the
    * watcher's maintenance tick
    * ([[PipelineMetrics.retireAgedDeadLetters]]). Default 0 keeps
    * everything — failures are data; aging them out is opt-in.
    */
  private def parseDlRetention(f: File,
      node: com.fasterxml.jackson.databind.JsonNode): Long =
    if (!node.hasNonNull("deadLetterRetentionMs")) 0L
    else {
      val v = node.get("deadLetterRetentionMs")
      // fail-loud conf discipline: a sign typo or a "7d" string
      // (asLong() -> 0) would register cleanly and silently never
      // retire anything the operator believes is aging out
      require(v.isNumber && v.canConvertToLong && v.asLong() >= 0L,
        s"${f.getName}: deadLetterRetentionMs must be a non-negative " +
          s"integer of milliseconds, got ${v.toString}")
      v.asLong()
    }

  /** Grace window before an online rebuild's superseded store versions
    * retire ([[SearchServingPipeline.rebuildStoreOnline]] step 5) — 0
    * (the default) retires immediately at the flip, the single-process
    * contract; a multi-driver deployment declares a window and the
    * watcher's maintenance tick sweeps once it elapses. Same fail-loud
    * discipline as deadLetterRetentionMs: a "5m" string or a sign typo
    * must not register as "retire immediately".
    */
  private def parseRetireAfter(f: File,
      node: com.fasterxml.jackson.databind.JsonNode): Long =
    if (!node.hasNonNull("retireAfterMs")) 0L
    else {
      val v = node.get("retireAfterMs")
      require(v.isNumber && v.canConvertToLong && v.asLong() >= 0L,
        s"${f.getName}: retireAfterMs must be a non-negative integer " +
          s"of milliseconds, got ${v.toString}")
      v.asLong()
    }

  /** Validate a conf's declared pipeline name at registration: the
    * name keys metrics rows, verdict rows, query names AND dead-letter
    * partition paths, so it must be the path-safe charset — otherwise
    * two names could sanitize onto one partition dir (silently
    * clobbering each other's dead letters) or diverge between the
    * stores that record raw vs sanitized values.
    */
  private def validName(f: File,
      node: com.fasterxml.jackson.databind.JsonNode): String = {
    val n = node.get("name").asText()
    require(n.matches("[A-Za-z0-9._-]+"),
      s"${f.getName}: pipeline name '$n' must match [A-Za-z0-9._-]+ — it " +
        "keys checkpoints, metrics rows and dead-letter paths")
    n
  }

  /** Prefix a pipeline ctor failure (schema/transform validation) with
    * the conf FILE, the registration unit an operator edits — a
    * resolution error naming only the pipeline is unactionable when two
    * files carry the same name.
    */
  private def named[A](f: File)(build: => A): A =
    try build
    catch {
      case e: IllegalArgumentException =>
        throw new IllegalArgumentException(s"${f.getName}: ${e.getMessage}")
    }

  /** Per-file strictness gate shared by every load flavor: at BOOT a
    * malformed conf fails fast (register-at-boot, S3 — a typo must not
    * make a production pipeline silently vanish); during a WATCHER scan
    * (`strict = false`) the offending file is quarantined with a log
    * line and the remaining confs keep their lifecycle — one bad file
    * dropped into the dir mid-run must not stall reloads and removals
    * for every healthy pipeline.
    */
  private def perFile[A](f: File, strict: Boolean)(build: => Option[A]): Option[A] =
    if (strict) build
    else
      scala.util.Try(build).recover { case e =>
        System.err.println(
          s"[PipelineRegistry] quarantined ${f.getName}: ${e.getMessage}")
        None
      }.get

  /** Discover and build every single-table LWW pipeline defined in
    * `dir` (confs without a `kind`, or `"kind": "lww"`). Fails fast on
    * a malformed conf (the reference's register-at-boot contract, S3)
    * unless `strict = false` (watcher scans — see [[perFile]]).
    * `"kind": "view"` confs are [[loadViews]]'s.
    */
  def load(dir: String, strict: Boolean = true): Seq[Entry] = {
    val mapper = new ObjectMapper()
    confFiles(dir).flatMap { f => perFile(f, strict) {
      val node = mapper.readTree(f)
      if (kindOf(f, node) != "lww") None
      else {
        def strSet(field: String): Set[String] =
          if (node.has(field)) node.get(field).elements().asScala.map(_.asText()).toSet
          else Set.empty
        require(node.hasNonNull("name") && node.hasNonNull("idKey")
            && node.hasNonNull("schema"),
          s"${f.getName}: name, idKey and schema are required")
        val rowSchema = StructType.fromDDL(node.get("schema").asText())
        val metricsTarget = parseMetrics(f, node)
        val dlDir = if (node.hasNonNull("deadLetterDir"))
          Some(node.get("deadLetterDir").asText()) else None
        // two-step build: the ctor validates the transform (file-named),
        // so the OUTGOING document schema — what expectations must
        // resolve against — is computable before the rules parse
        val (drift, driftPol) = parseDrift(f, node, dlDir, metricsTarget)
        val pipeline0 = named(f)(CdcPipeline(
          name = validName(f, node),
          subscription = Subscription(strSet("databases"), strSet("tables")),
          rowSchema = rowSchema,
          idKey = node.get("idKey").asText(),
          deadLetterDir = dlDir,
          exprTransform = parseTransform(f, node),
          metrics = metricsTarget,
          driftCheck = drift,
          driftPolicy = driftPol,
          deadLetterRetentionMs = parseDlRetention(f, node)))
        val servingSchema =
          SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
            .map(pipeline0.outgoingRowSchema).getOrElse(rowSchema)
        val expectRules = parseExpectationsWithStore(f, node, servingSchema,
          metricsTarget, dlDir)
        val pipeline = named(f)(pipeline0.copy(expectations = expectRules))
        // optional per-conf serving target (the reference's per-script
        // url/auth); its id key is ALWAYS the conf's declared idKey
        val target =
          if (!node.hasNonNull("es")) None
          else {
            val es = node.get("es")
            require(es.hasNonNull("url") && es.hasNonNull("username")
                && es.hasNonNull("password"),
              s"${f.getName}: es target needs url, username and password")
            Some(EsSink.Config(es.get("url").asText(),
              es.get("username").asText(), es.get("password").asText(),
              idKey = node.get("idKey").asText()))
          }
        Some(Entry(pipeline, f.getAbsolutePath, f.lastModified(), target))
      }
    }}
  }

  final case class ViewEntry(pipeline: ViewPipeline, file: String, mtime: Long)

  /** Discover and build every `"kind": "view"` pipeline in `dir` — the
    * fact ⋈ dim denormalization flow as registry data:
    * {{{
    *   { "kind": "view", "name": "orders_enriched",
    *     "databases": ["shop"], "leftOuter": true,
    *     "fact": { "table": "orders", "idKey": "o_orderkey",
    *               "joinKey": "o_custkey",
    *               "schema": "o_orderkey BIGINT, o_custkey BIGINT, ..." },
    *     "dim":  { "table": "customer", "idKey": "c_custkey",
    *               "joinKey": "c_custkey",
    *               "schema": "c_custkey BIGINT, c_name STRING, ..." },
    *     "jdbc": { "url": "jdbc:derby:...", "table": "enriched",
    *               "stagingColumnTypes": "c_name VARCHAR(64), ..." } }
    * }}}
    * The sink half is a [[ViewTarget]]: `"jdbc"` as above, or `"es"`
    * (`{ "url", "username", "password" }`) for the reference's
    * id-keyed Elasticsearch document serving.
    * Each side object may also declare its OWN `"driftPolicy"` (same
    * shape as the conf-level one, which it overrides for that side):
    * the fact and dim wires evolve on different clocks, so dim-side
    * warn monitoring can ride beside fact-side drop enforcement.
    * Same lifecycle as LWW entries: [[changedSince]]/[[removedSince]]
    * key on the conf file, and the work dir a runner derives from the
    * conf file name ([[ckptKey]]) preserves checkpoints across restarts.
    */
  def loadViews(dir: String, strict: Boolean = true): Seq[ViewEntry] = {
    val mapper = new ObjectMapper()
    confFiles(dir).flatMap { f => perFile(f, strict) {
      val node = mapper.readTree(f)
      if (kindOf(f, node) != "view") None
      else {
        require(node.hasNonNull("name") && node.hasNonNull("fact")
            && node.hasNonNull("dim"),
          s"${f.getName}: view confs need name, fact and dim")
        def side(field: String) = {
          val s = node.get(field)
          require(s.hasNonNull("table") && s.hasNonNull("idKey")
              && s.hasNonNull("joinKey") && s.hasNonNull("schema"),
            s"${f.getName}: $field needs table, idKey, joinKey and schema")
          (s.get("table").asText(), StructType.fromDDL(s.get("schema").asText()),
            s.get("idKey").asText(), s.get("joinKey").asText())
        }
        val (fTable, fSchema, fId, fJoin) = side("fact")
        val (dTable, dSchema, dId, dJoin) = side("dim")
        val viewMetrics = parseMetrics(f, node)
        val tgt: ViewTarget =
          if (node.hasNonNull("jdbc")) {
            val jdbc = node.get("jdbc")
            require(jdbc.hasNonNull("url") && jdbc.hasNonNull("table"),
              s"${f.getName}: jdbc needs url and table")
            JdbcTarget(jdbc.get("url").asText(), jdbc.get("table").asText(),
              if (jdbc.hasNonNull("stagingColumnTypes"))
                Some(jdbc.get("stagingColumnTypes").asText()) else None)
          } else {
            require(node.hasNonNull("es"),
              s"${f.getName}: view confs need a jdbc or es target")
            val es = node.get("es")
            require(es.hasNonNull("url"), s"${f.getName}: es needs url")
            EsTarget(es.get("url").asText(),
              if (es.hasNonNull("username")) es.get("username").asText() else "",
              if (es.hasNonNull("password")) es.get("password").asText() else "")
          }
        val dbs =
          if (node.has("databases"))
            node.get("databases").elements().asScala.map(_.asText()).toSet
          else Set("shop")
        val dlDir = if (node.hasNonNull("deadLetterDir"))
          Some(node.get("deadLetterDir").asText()) else None
        val (vDrift, vDriftPol) = parseDrift(f, node, dlDir, viewMetrics)
        // per-side overrides of the shared policy: the fact and dim
        // wires evolve on different clocks, so each side object may
        // declare its own `"driftPolicy"` (same shape, same
        // invariants) — e.g. dim-side warn-monitoring beside fact-side
        // drop enforcement
        def sideDriftPol(field: String): Option[CdcPipeline.DriftPolicy] = {
          val s = node.get(field)
          if (!s.hasNonNull("driftPolicy")) None
          else Some(parseDriftPolicy(f, s"$field.driftPolicy",
            s.get("driftPolicy"), dlDir))
        }
        val fDriftPol = sideDriftPol("fact")
        val dDriftPol = sideDriftPol("dim")
        if (fDriftPol.isDefined || dDriftPol.isDefined) {
          require(viewMetrics.isDefined,
            s"${f.getName}: a per-side driftPolicy needs a metrics " +
              "target to record into")
          viewMetrics.foreach(PipelineMetrics.ensureDriftTable)
        }
        // two-step build (the lww precedent): ctor validates the
        // transform, then expectations resolve against the
        // POST-TRANSFORM flattened serving row a consumer reads
        val pipeline0 = named(f)(ViewPipeline(
          name = validName(f, node),
          databases = dbs,
          factTable = fTable, factSchema = fSchema, factIdField = fId,
          factJoinField = fJoin,
          dimTable = dTable, dimSchema = dSchema, dimIdField = dId,
          dimJoinField = dJoin,
          leftOuter = node.has("leftOuter") && node.get("leftOuter").asBoolean(),
          target = tgt,
          deadLetterDir = dlDir,
          exprTransform = parseTransform(f, node),
          metrics = viewMetrics,
          driftCheck = vDrift, driftPolicy = vDriftPol,
          factDriftPolicy = fDriftPol, dimDriftPolicy = dDriftPol,
          deadLetterRetentionMs = parseDlRetention(f, node)))
        val servingSchema =
          SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
            .map(pipeline0.servingRowSchema)
            .getOrElse(StructType(fSchema.fields ++ dSchema.fields))
        val expectRules = parseExpectationsWithStore(f, node, servingSchema,
          viewMetrics, dlDir)
        val pipeline = named(f)(pipeline0.copy(expectations = expectRules))
        Some(ViewEntry(pipeline, f.getAbsolutePath, f.lastModified()))
      }
    }}
  }

  final case class AnnEntry(pipeline: AnnServingPipeline, file: String,
      mtime: Long)

  /** Discover and build every `"kind": "ann"` pipeline in `dir` — the
    * streaming ANN serving flow ([[AnnServingPipeline]]) as registry
    * data:
    * {{{
    *   { "kind": "ann", "name": "vecs",
    *     "databases": ["shop"], "table": "embeddings",
    *     "idKey": "vec_id", "vectorField": "embedding",
    *     "centroids": [[1.0, 0.0], [-1.0, 0.0]],
    *     "jdbc": { "url": "jdbc:derby:...", "postingsTable": "postings",
    *               "certTable": "ann_cert" },
    *     "k": 5, "nProbe": 4, "recallFloor": 0.6, "skewBound": 4.0 }
    * }}}
    * `centroids` is the BOOTSTRAP quantizer — an index artifact shipped
    * as conf data, seeding generation 0 only; retrain-and-swap evolves
    * it through the generation pointer without touching the conf.
    * Optional `"es": { "url", "username", "password" }` adds the
    * consumer-facing document MIRROR (one ES document per served
    * vector; jdbc stays the index's source of truth), with optional
    * `"deadLetterDir"` for undeliverable mirror rows.
    * Same lifecycle keys as the other kinds (conf file + [[ckptKey]]).
    */
  def loadAnn(dir: String, strict: Boolean = true): Seq[AnnEntry] = {
    val mapper = new ObjectMapper()
    confFiles(dir).flatMap { f => perFile(f, strict) {
      val node = mapper.readTree(f)
      if (kindOf(f, node) != "ann") None
      else {
        require(node.hasNonNull("name") && node.hasNonNull("table")
            && node.hasNonNull("idKey") && node.hasNonNull("vectorField")
            && node.hasNonNull("centroids") && node.hasNonNull("jdbc"),
          s"${f.getName}: ann confs need name, table, idKey, vectorField, " +
            "centroids and jdbc")
        val cents = node.get("centroids").elements().asScala.map(row =>
          row.elements().asScala.map(_.floatValue()).toArray).toArray
        require(cents.nonEmpty && cents.forall(_.length == cents.head.length),
          s"${f.getName}: centroids must be a non-empty rectangular array")
        val jdbc = node.get("jdbc")
        require(jdbc.hasNonNull("url") && jdbc.hasNonNull("postingsTable"),
          s"${f.getName}: jdbc needs url and postingsTable")
        def dbl(field: String, dflt: Double): Double =
          if (node.hasNonNull(field)) node.get(field).asDouble() else dflt
        def int(field: String, dflt: Int): Int =
          if (node.hasNonNull(field)) node.get(field).asInt() else dflt
        val dbs =
          if (node.has("databases"))
            node.get("databases").elements().asScala.map(_.asText()).toSet
          else Set("shop")
        val annMetrics = parseMetrics(f, node)
        val annDlDir = if (node.hasNonNull("deadLetterDir"))
          Some(node.get("deadLetterDir").asText()) else None
        val (annDrift, annDriftPol) = parseDrift(f, node, annDlDir, annMetrics)
        val pipeline = AnnServingPipeline(
          name = validName(f, node),
          databases = dbs,
          table = node.get("table").asText(),
          idField = node.get("idKey").asText(),
          vectorField = node.get("vectorField").asText(),
          cents = cents,
          jdbcUrl = jdbc.get("url").asText(),
          postingsTable = jdbc.get("postingsTable").asText(),
          certTable = if (jdbc.hasNonNull("certTable"))
            Some(jdbc.get("certTable").asText()) else None,
          k = int("k", 5), nProbe = int("nProbe", 4),
          recallFloor = dbl("recallFloor", 0.6),
          skewBound = dbl("skewBound", 4.0),
          autoRetrain = node.hasNonNull("autoRetrain")
            && node.get("autoRetrain").asBoolean(),
          maxGenAgeMs =
            if (node.hasNonNull("maxGenAgeMs")) node.get("maxGenAgeMs").asLong()
            else 0L,
          metrics = annMetrics,
          // expectation columns resolve against the posting ACTION row
          // the index store serves: the conf's id plus the advisory cell
          expectations = parseExpectationsWithStore(f, node,
            StructType.fromDDL(
              s"${node.get("idKey").asText()} BIGINT, cell INT"),
            annMetrics, annDlDir),
          // optional consumer-facing document mirror (the view/dedup
          // confs' "es" shape); jdbc stays the index's source of truth
          esMirror =
            if (!node.hasNonNull("es")) None
            else {
              val es = node.get("es")
              require(es.hasNonNull("url"), s"${f.getName}: es needs url")
              Some(EsTarget(es.get("url").asText(),
                if (es.hasNonNull("username")) es.get("username").asText() else "",
                if (es.hasNonNull("password")) es.get("password").asText() else ""))
            },
          deadLetterDir = annDlDir,
          driftCheck = annDrift, driftPolicy = annDriftPol,
          deadLetterRetentionMs = parseDlRetention(f, node))
        Some(AnnEntry(pipeline, f.getAbsolutePath, f.lastModified()))
      }
    }}
  }

  final case class DedupEntry(pipeline: DedupClusterPipeline, file: String,
      mtime: Long)

  /** Discover and build every `"kind": "dedup"` pipeline in `dir` — the
    * streaming dedup-cluster serving flow ([[DedupClusterPipeline]]) as
    * registry data:
    * {{{
    *   { "kind": "dedup", "name": "docs",
    *     "databases": ["shop"], "table": "documents",
    *     "idKey": "doc_id", "textField": "text",
    *     "jdbc": { "url": "jdbc:derby:...", "clustersTable": "clusters" },
    *     "shingleN": 3, "bands": 16, "rows": 4, "maxBucket": 256 }
    * }}}
    * The sink half is a [[ViewTarget]] like view confs: `"jdbc"` as
    * above, or `"es"` (`{ "url", "username", "password" }`) for
    * id-keyed cluster documents.
    */
  def loadDedup(dir: String, strict: Boolean = true): Seq[DedupEntry] = {
    val mapper = new ObjectMapper()
    confFiles(dir).flatMap { f => perFile(f, strict) {
      val node = mapper.readTree(f)
      if (kindOf(f, node) != "dedup") None
      else {
        require(node.hasNonNull("name") && node.hasNonNull("table")
            && node.hasNonNull("idKey") && node.hasNonNull("textField"),
          s"${f.getName}: dedup confs need name, table, idKey and textField")
        val tgt: ViewTarget =
          if (node.hasNonNull("jdbc")) {
            val jdbc = node.get("jdbc")
            require(jdbc.hasNonNull("url") && jdbc.hasNonNull("clustersTable"),
              s"${f.getName}: jdbc needs url and clustersTable")
            JdbcTarget(jdbc.get("url").asText(),
              jdbc.get("clustersTable").asText())
          } else {
            require(node.hasNonNull("es"),
              s"${f.getName}: dedup confs need a jdbc or es target")
            val es = node.get("es")
            require(es.hasNonNull("url"), s"${f.getName}: es needs url")
            EsTarget(es.get("url").asText(),
              if (es.hasNonNull("username")) es.get("username").asText() else "",
              if (es.hasNonNull("password")) es.get("password").asText() else "")
          }
        def int(field: String, dflt: Int): Int =
          if (node.hasNonNull(field)) node.get(field).asInt() else dflt
        val dbs =
          if (node.has("databases"))
            node.get("databases").elements().asScala.map(_.asText()).toSet
          else Set("shop")
        val dedupMetrics = parseMetrics(f, node)
        val dedupDlDir = if (node.hasNonNull("deadLetterDir"))
          Some(node.get("deadLetterDir").asText()) else None
        val (ddDrift, ddDriftPol) = parseDrift(f, node, dedupDlDir,
          dedupMetrics)
        val pipeline = DedupClusterPipeline(
          name = validName(f, node),
          databases = dbs,
          table = node.get("table").asText(),
          idField = node.get("idKey").asText(),
          textField = node.get("textField").asText(),
          target = tgt,
          shingleN = int("shingleN", 3), bands = int("bands", 16),
          rows = int("rows", 4), maxBucket = int("maxBucket", Int.MaxValue),
          deadLetterDir = dedupDlDir,
          verifyThreshold =
            if (node.hasNonNull("verifyThreshold"))
              Some(node.get("verifyThreshold").asDouble()) else None,
          metrics = dedupMetrics,
          // expectation columns resolve against the changed CLUSTER row
          // a serving consumer reads: conf id + cluster assignment
          expectations = parseExpectationsWithStore(f, node,
            StructType.fromDDL(s"${node.get("idKey").asText()} BIGINT, " +
              "cluster_id BIGINT, is_canonical BOOLEAN"),
            dedupMetrics, dedupDlDir),
          driftCheck = ddDrift, driftPolicy = ddDriftPol,
          deadLetterRetentionMs = parseDlRetention(f, node))
        Some(DedupEntry(pipeline, f.getAbsolutePath, f.lastModified()))
      }
    }}
  }

  final case class SearchEntry(pipeline: SearchServingPipeline, file: String,
      mtime: Long)

  /** Discover and build every `"kind": "search"` pipeline in `dir` —
    * the streaming inverted-index/BM25 serving flow
    * ([[SearchServingPipeline]]) as registry data:
    * {{{
    *   { "kind": "search", "name": "docs",
    *     "databases": ["shop"], "table": "documents",
    *     "idKey": "doc_id", "textField": "text",
    *     "jdbc": { "url": "jdbc:derby:...", "postingsTable": "postings",
    *               "lensTable": "doclens" } }
    * }}}
    */
  def loadSearch(dir: String, strict: Boolean = true): Seq[SearchEntry] = {
    val mapper = new ObjectMapper()
    confFiles(dir).flatMap { f => perFile(f, strict) {
      val node = mapper.readTree(f)
      if (kindOf(f, node) != "search") None
      else {
        require(node.hasNonNull("name") && node.hasNonNull("table")
            && node.hasNonNull("idKey") && node.hasNonNull("textField")
            && node.hasNonNull("jdbc"),
          s"${f.getName}: search confs need name, table, idKey, textField and jdbc")
        val jdbc = node.get("jdbc")
        require(jdbc.hasNonNull("url") && jdbc.hasNonNull("postingsTable")
            && jdbc.hasNonNull("lensTable"),
          s"${f.getName}: jdbc needs url, postingsTable and lensTable")
        val dbs =
          if (node.has("databases"))
            node.get("databases").elements().asScala.map(_.asText()).toSet
          else Set("shop")
        def dbl(field: String, dflt: Double): Double =
          if (node.hasNonNull(field)) node.get(field).asDouble() else dflt
        val searchMetrics = parseMetrics(f, node)
        val searchDlDir = if (node.hasNonNull("deadLetterDir"))
          Some(node.get("deadLetterDir").asText()) else None
        val (sDrift, sDriftPol) = parseDrift(f, node, searchDlDir,
          searchMetrics)
        val pipeline = SearchServingPipeline(
          name = validName(f, node),
          databases = dbs,
          table = node.get("table").asText(),
          idField = node.get("idKey").asText(),
          textField = node.get("textField").asText(),
          jdbcUrl = jdbc.get("url").asText(),
          postingsTable = jdbc.get("postingsTable").asText(),
          lensTable = jdbc.get("lensTable").asText(),
          k1 = dbl("k1", 1.2), b = dbl("b", 0.75),
          metrics = searchMetrics,
          // expectation columns resolve against the batch's ± posting
          // contribution row the additive MERGE applies
          expectations = parseExpectationsWithStore(f, node,
            StructType.fromDDL("token STRING, doc_id BIGINT, tf BIGINT"),
            searchMetrics, searchDlDir),
          deadLetterDir = searchDlDir,
          driftCheck = sDrift, driftPolicy = sDriftPol,
          deadLetterRetentionMs = parseDlRetention(f, node),
          retireAfterMs = parseRetireAfter(f, node))
        Some(SearchEntry(pipeline, f.getAbsolutePath, f.lastModified()))
      }
    }}
  }

  /** [[changedSince]] for the search-pipeline lifecycle. */
  def changedSearchSince(known: Seq[SearchEntry], dir: String): Seq[String] =
    changedOfKind(known.map(e => e.file -> e.mtime).toMap, dir, "search")

  /** [[removedSince]] for the search-pipeline lifecycle. */
  def removedSearchSince(known: Seq[SearchEntry], dir: String): Seq[String] =
    removedOfKind(known.map(_.file), "search")

  /** [[changedSince]] for the dedup-pipeline lifecycle. */
  def changedDedupSince(known: Seq[DedupEntry], dir: String): Seq[String] =
    changedOfKind(known.map(e => e.file -> e.mtime).toMap, dir, "dedup")

  /** [[removedSince]] for the dedup-pipeline lifecycle. */
  def removedDedupSince(known: Seq[DedupEntry], dir: String): Seq[String] =
    removedOfKind(known.map(_.file), "dedup")

  /** [[changedSince]] for the ann-pipeline lifecycle. */
  def changedAnnSince(known: Seq[AnnEntry], dir: String): Seq[String] =
    changedOfKind(known.map(e => e.file -> e.mtime).toMap, dir, "ann")

  /** [[removedSince]] for the ann-pipeline lifecycle. */
  def removedAnnSince(known: Seq[AnnEntry], dir: String): Seq[String] =
    removedOfKind(known.map(_.file), "ann")

  /** Run every registered view pipeline once over the feed's current
    * contents — each under its own conf-file-keyed work dir (the same
    * checkpoint-identity rule as [[ckptKey]]), so restarts resume and a
    * renamed view keeps its cursor.
    */
  def runViews(entries: Seq[ViewEntry], spark: SparkSession,
      sourceDir: String, workRoot: String,
      esTransport: graft.sinks.EsSink.Transport =
        new graft.sinks.EsSink.HttpTransport): Unit =
    entries.foreach { e =>
      e.pipeline.runOnce(spark, sourceDir, s"$workRoot/${ckptKey(e.file)}",
        esTransport)
    }

  private def confFilesOfKind(dir: String, kind: String): Seq[File] = {
    // lenient: a file that cannot be parsed (or carries an unknown
    // kind) matches NO kind — it is quarantined from every scan rather
    // than aborting the watcher's whole cycle
    val files = confFiles(dir)
    evictDeleted(dir, files.map(_.getAbsolutePath).toSet)
    files.filter(f => lenientKindOf(f).contains(kind))
  }

  /** Known conf files that left this lifecycle: deleted from the dir,
    * OR still present but now carrying a DIFFERENT recognized kind — an
    * edited `"kind"` field re-homes the file, and the old-kind queries
    * must stop (otherwise they keep running untracked while the
    * new-kind pipeline starts against the same work dir). A file whose
    * kind is currently unreadable is NOT removed — quarantine keeps the
    * running pipeline on its last good conf.
    */
  private def removedOfKind(knownFiles: Seq[String], kind: String): Seq[String] =
    knownFiles.filter { path =>
      val f = new File(path)
      !f.exists() || lenientKindOf(f).exists(_ != kind)
    }

  private def changedOfKind(knownFiles: Map[String, Long], dir: String,
      kind: String): Seq[String] =
    confFilesOfKind(dir, kind).filter { f =>
      knownFiles.get(f.getAbsolutePath) match {
        case Some(m) => f.lastModified() != m
        case None => true
      }
    }.map(_.getAbsolutePath)

  /** LWW conf files added or modified since `known` was loaded — the
    * pipelines whose queries need a restart (S2 reload semantics).
    * Kind-scoped: a `"kind": "view"` conf in the same dir belongs to
    * [[changedViewsSince]]'s lifecycle, not this one — without the
    * filter an LWW watcher would flag it as "new" forever (load() never
    * admits it to the known set) and busy-loop on reloads.
    */
  def changedSince(known: Seq[Entry], dir: String): Seq[String] =
    changedOfKind(known.map(e => e.file -> e.mtime).toMap, dir, "lww")

  /** [[changedSince]] for the view-pipeline lifecycle. */
  def changedViewsSince(known: Seq[ViewEntry], dir: String): Seq[String] =
    changedOfKind(known.map(e => e.file -> e.mtime).toMap, dir, "view")

  /** Known conf files that left the LWW lifecycle — deleted, or
    * re-homed to another kind by an edited `"kind"` field
    * ([[removedOfKind]]): the pipelines whose queries must be STOPPED
    * (deregistration, the delete half of the reference's script-watcher
    * lifecycle).
    */
  def removedSince(known: Seq[Entry], dir: String): Seq[String] =
    removedOfKind(known.map(_.file), "lww")

  /** [[removedSince]] for the view-pipeline lifecycle. */
  def removedViewsSince(known: Seq[ViewEntry], dir: String): Seq[String] =
    removedOfKind(known.map(_.file), "view")

  /** Start every registered pipeline over one shared feed — the
    * reference's fan-out topology (R11): each query gets its own
    * checkpoint dir under `ckptRoot` (its named tailer), keyed by conf
    * file ([[ckptKey]]).
    */
  def startAll(entries: Seq[Entry], spark: SparkSession, sourceDir: String,
      ckptRoot: String, cfg: EsSink.Config,
      transport: EsSink.Transport): Seq[StreamingQuery] =
    entries.map { e =>
      e.pipeline.startDsv2(spark, sourceDir,
        s"$ckptRoot/${ckptKey(e.file)}", effectiveCfg(e, cfg), transport)
    }
}
