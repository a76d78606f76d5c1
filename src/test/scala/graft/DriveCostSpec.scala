package graft

import graft.queries.DriveCost
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The drive-cost sidecar lifecycle and the r16 regression gate:
  * record → collect round-trips with the data-root tag, attribution is
  * EXACT by tag (the r15 suffix-match pooled two warehouses whose
  * sanitized roots share a suffix), and [[DriveCost.flagRegressions]]
  * flags >2× costs at the same log base without flagging first
  * appearances or sub-floor jitter.
  */
class DriveCostSpec extends AnyFunSuite {

  private def mkWarehouse(): java.nio.file.Path =
    Files.createTempDirectory("graft_drivecost_")

  test("record/collect round-trip carries drive, cost and data-root tag") {
    val wh = mkWarehouse()
    val base = wh.resolve("metrics_data_sf0_1/fp123")
    Files.createDirectories(base)
    DriveCost.record(base.toString, "q141",
      System.nanoTime() - 50000000L, "/data/sf0.1")
    val got = DriveCost.collect(wh.toString)
    assert(got.size == 1)
    val d = got.head
    assert(d.drive == "q141" && d.log == "metrics_data_sf0_1")
    assert(d.ms >= 50L && d.ms < 5000L)
    assert(d.tag == "_data_sf0_1")
  }

  test("a hostile drive name is sanitized where the JSON is written") {
    val wh = mkWarehouse()
    val base = wh.resolve("log_x/fp")
    Files.createDirectories(base)
    DriveCost.record(base.toString, "q\"veil\\", System.nanoTime(), "/d")
    val got = DriveCost.collect(wh.toString)
    assert(got.size == 1, "a quote in the name must not corrupt the sidecar")
    assert(got.head.drive == "q_veil_")
  }

  test("attribution is exact by tag: suffix-sharing roots never pool") {
    val a = DriveCost.Drive("q1", "m_data_sf0_1", 100L, "_data_sf0_1")
    val b = DriveCost.Drive("q1", "m_old_data_sf0_1", 100L, "_old_data_sf0_1")
    assert(DriveCost.belongsTo(a, "_data_sf0_1"))
    assert(!DriveCost.belongsTo(b, "_data_sf0_1"),
      "/old/data/sf0.1 must not pool into /data/sf0.1's headline")
    // legacy sidecar (no tag): falls back to the log-name suffix so a
    // warm pre-tag warehouse keeps reporting
    val legacy = DriveCost.Drive("q1", "m_data_sf0_1", 100L, "")
    assert(DriveCost.belongsTo(legacy, "_data_sf0_1"))
  }

  test("regression gate: >2x at the same log base flags; first appearance and sub-floor jitter pass") {
    val baseline = Map(
      ("q151", "logA") -> 10000L,
      ("q154", "logB") -> 10000L,
      ("q159", "logC") -> 200L)
    val current = Seq(
      DriveCost.Drive("q151", "logA", 25000L, "t"), // 2.5x — flags
      DriveCost.Drive("q154", "logB", 15000L, "t"), // 1.5x — passes
      DriveCost.Drive("q154", "logOther", 90000L, "t"), // other log base
      DriveCost.Drive("q159", "logC", 900L, "t"), // 4.5x but sub-floor
      DriveCost.Drive("q179", "logD", 99000L, "t")) // no baseline yet
    val flagged = DriveCost.flagRegressions(current, baseline)
    assert(flagged.map(f => (f.drive, f.log)) == Seq(("q151", "logA")))
    assert(flagged.head.ms == 25000L && flagged.head.baselineMs == 10000L)
  }

  test("baseline parses bench_drives.json shape; absent file reads empty") {
    val f = Files.createTempFile("graft_drives_base_", ".json")
    Files.write(f, ("""{"drives":[{"drive":"q151","log":"logA","ms":10000,""" +
      """"tag":"t"},{"drive":"q154","log":"logB","ms":7}],""" +
      """"total_ms":10007,"n":2,"sf":"/d"}""").getBytes("UTF-8"))
    val base = DriveCost.parseBaseline(f.toString)
    assert(base == Map(("q151", "logA") -> 10000L, ("q154", "logB") -> 7L))
    assert(DriveCost.parseBaseline("/nonexistent/x.json").isEmpty,
      "a missing baseline must read empty, never fail the bench")
  }
}
