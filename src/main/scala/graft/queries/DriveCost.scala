package graft.queries

/** One-time wall-clock of the MEMOIZED lifecycle drives (q141/q151/
  * q154/.../q179): each drives a full pipeline lifecycle once per data
  * fingerprint and then serves reads from the built store, so every
  * committed bench records 0.03–0.12 s for them — the drive's actual
  * cost (the thing a replay/rebuild regression would move) appears in
  * no artifact. Fix: the drive records its first-run wall clock as a
  * `_DRIVE_COST.json` sidecar BESIDE the memoized store (under the
  * fingerprinted log base, so it expires with the store it describes),
  * and [[graft.Bench]] collects every sidecar in the warehouse into
  * `bench_drives.json` — first-drive costs ride along with whichever
  * round's artifact triggered the drive.
  *
  * A crash-retried drive records only the final successful leg (the
  * completed legs' work is behind checkpoints/markers) — still the
  * cost an operator would see on that retry, and the regression signal
  * survives.
  */
object DriveCost {

  /** Record the drive's one-time cost beside its memoized store.
    * Failures log and continue: cost accounting must not fail the
    * drive whose store already built.
    */
  def record(base: String, name: String, t0Nanos: Long): Unit = {
    val ms = (System.nanoTime() - t0Nanos) / 1000000L
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(base, "_DRIVE_COST.json"),
        (s"""{"drive":"$name","ms":$ms}""" + "\n").getBytes("UTF-8"))
      ()
    } catch {
      case e: Exception =>
        System.err.println(s"[DriveCost] $name cost not recorded: $e")
    }
  }

  /** Every recorded drive cost in the warehouse, as (drive, logName,
    * ms) sorted by cost descending — the warehouse layout is
    * `<root>/<logName>/<fingerprint>/` ([[graft.cdc.DeltaLog.logBase]]),
    * so the sidecars sit exactly two levels down. Driver-side listing
    * of a driver-sized structure (one entry per memoized drive).
    */
  def collect(warehouseRoot: String): Seq[(String, String, Long)] = {
    val root = new java.io.File(warehouseRoot)
    val logs = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
    logs.flatMap { log =>
      Option(log.listFiles()).getOrElse(Array.empty)
        .filter(_.isDirectory).flatMap { fpDir =>
          val f = new java.io.File(fpDir, "_DRIVE_COST.json")
          if (!f.isFile) None
          else scala.util.Try {
            val s = new String(
              java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
            val drive = "\"drive\":\"([^\"]+)\"".r
              .findFirstMatchIn(s).map(_.group(1)).getOrElse("?")
            val ms = "\"ms\":(\\d+)".r
              .findFirstMatchIn(s).map(_.group(1).toLong).getOrElse(-1L)
            (drive, log.getName, ms)
          }.toOption
        }
    }.toSeq.sortBy(-_._3)
  }
}
