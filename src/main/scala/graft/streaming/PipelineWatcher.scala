package graft.streaming

import graft.sinks.EsSink
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery
import scala.collection.mutable

/** In-flight conf reload driver (S2 parity): the reference watches its
  * scripts directory and hot-reloads changed scripts without restarting
  * the process (WatchFile.java:84-161 debounced watcher →
  * ScriptContainer.java:69-81 re-registration). A Structured Streaming
  * query cannot swap its plan mid-flight, so the Spark-native analog
  * is: detect changed/new conf files ([[PipelineRegistry.changedSince]])
  * → stop the affected query → rebuild its pipeline from the new conf →
  * restart it against the SAME checkpoint. The checkpoint's offsets
  * preserve the cursor, so the reloaded query resumes exactly after the
  * last committed micro-batch — no event lost, none re-applied beyond
  * the at-least-once contract (id-keyed LWW upserts make replays
  * idempotent) — and the materialized state equals an uninterrupted
  * run's (asserted E2E in RegistrySpec).
  *
  * The poll interval doubles as the reference's 500 ms debounce quantum
  * (WatchFile.java:49): a conf saved mid-poll is picked up whole on the
  * next tick because detection compares mtimes, not events. Conf
  * DELETION deregisters: the query stops, the checkpoint stays, a
  * restored conf resumes from its cursor. Checkpoints are keyed by conf
  * file ([[PipelineRegistry.ckptKey]]) like the control maps — never by
  * pipeline name, so name collisions cannot put two live queries on one
  * checkpoint location.
  *
  * Driver-side control loop only — the data path stays the streaming
  * queries'; the watcher never touches rows.
  */
final class PipelineWatcher(
    spark: SparkSession, confDir: String, sourceDir: String, ckptRoot: String,
    cfg: EsSink.Config, transport: EsSink.Transport, pollMs: Long = 500L) {

  private val entries = mutable.Map.empty[String, PipelineRegistry.Entry]
  // Keyed by CONF FILE — the unit of reload — not pipeline name: a conf
  // that renames its pipeline must still stop the query it previously
  // started, and two confs that (mis)share a name must not clobber each
  // other's handle (an unreachable handle is an unstoppable query).
  private val queries = mutable.Map.empty[String, StreamingQuery]
  @volatile private var running = false
  private var loop: Thread = _

  /** Initial discovery + start of every registered pipeline (the boot
    * half; [[PipelineRegistry.startAll]] semantics, tracked for reload).
    */
  def startPipelines(): Seq[StreamingQuery] = synchronized {
    val loaded = PipelineRegistry.load(confDir)
    loaded.map { e =>
      entries(e.file) = e
      val q = e.pipeline.startDsv2(spark, sourceDir,
        s"$ckptRoot/${PipelineRegistry.ckptKey(e.file)}", cfg, transport)
      queries(e.file) = q
      q
    }
  }

  /** One detection/reload cycle; returns the names of pipelines that
    * were (re)started. Deleted confs DEREGISTER: their query stops and
    * leaves the control maps (the checkpoint stays on disk, so a
    * restored conf resumes from its cursor). Exposed so tests drive
    * the reload deterministically — the background loop just calls
    * this on a timer.
    */
  def pollOnce(): Seq[String] = synchronized {
    val removed = PipelineRegistry.removedSince(entries.values.toSeq, confDir)
    removed.foreach { f =>
      queries.remove(f).foreach(q => if (q.isActive) q.stop())
      entries.remove(f)
    }
    val changed = PipelineRegistry.changedSince(entries.values.toSeq, confDir).toSet
    if (changed.isEmpty) Seq.empty
    else PipelineRegistry.load(confDir).filter(e => changed(e.file)).map { e =>
      queries.get(e.file).foreach(q => if (q.isActive) q.stop())
      entries(e.file) = e
      val q = e.pipeline.startDsv2(spark, sourceDir,
        s"$ckptRoot/${PipelineRegistry.ckptKey(e.file)}", cfg, transport)
      queries(e.file) = q
      e.pipeline.name
    }
  }

  /** Spawn the daemon polling loop (the WatchFile thread). */
  def startWatching(): this.type = {
    running = true
    loop = new Thread(() => {
      while (running) {
        try {
          Thread.sleep(pollMs)
          pollOnce()
        } catch {
          case _: InterruptedException => // stop() interrupts the sleep
          case e: Exception =>
            // reference behavior: a failed reload logs and keeps watching
            System.err.println(s"[PipelineWatcher] reload failed: ${e.getMessage}")
        }
      }
    }, "graft-pipeline-watcher")
    loop.setDaemon(true)
    loop.start()
    this
  }

  /** Stop watching and stop every active query. */
  def stop(): Unit = {
    running = false
    if (loop != null) { loop.interrupt(); loop.join(5000) }
    synchronized { queries.values.foreach(q => if (q.isActive) q.stop()) }
  }

  /** Active query per pipeline name (tests / operational visibility —
    * the control map stays conf-file-keyed; this is the display view).
    */
  def activeQueries: Map[String, StreamingQuery] = synchronized {
    entries.values.flatMap(e =>
      queries.get(e.file).map(q => e.pipeline.name -> q)).toMap
  }
}
