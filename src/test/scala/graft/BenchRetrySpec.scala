package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's contention self-defense ([[Bench.measureWithRetry]]):
  * a wide per-run spread triggers bounded re-measurement and the
  * tighter set wins; a clean run never re-measures. Simulated with a
  * scripted timer — a CONTENDED first window (one run caught behind
  * synthetic load) followed by clean windows, exactly the r7 artifact's
  * failure shape (1.4→22.4 s spreads at loadavg 4.7).
  */
class BenchRetrySpec extends AnyFunSuite {

  private def scripted(times: Double*): () => Double = {
    val it = Iterator(times: _*)
    () => it.next()
  }

  test("contended first window re-measures and the clean retry's median wins") {
    // first 3 runs: one clean, two caught behind load (spread 12x);
    // retry runs: all clean
    val (runs, tries) = Bench.measureWithRetry(
      scripted(0.5, 6.0, 5.5, 0.52, 0.49, 0.51))
    assert(tries == 1)
    assert(runs == Seq(0.49, 0.51, 0.52))
    assert(runs(1) < 1.0, "median must come from the clean window")
  }

  test("clean run takes exactly 3 measurements, no retries") {
    var calls = 0
    val (runs, tries) = Bench.measureWithRetry { () => calls += 1; 0.5 }
    assert(tries == 0 && calls == 3 && runs == Seq(0.5, 0.5, 0.5))
  }

  test("sub-floor jitter is not contention: 10x spread under 300 ms passes") {
    var calls = 0
    val script = Seq(0.005, 0.06, 0.02)
    val (_, tries) = Bench.measureWithRetry { () =>
      val v = script(calls % 3); calls += 1; v
    }
    assert(tries == 0 && calls == 3)
  }

  test("persistently wide spread stops after maxRetries and keeps the best set") {
    var calls = 0
    val (runs, tries) = Bench.measureWithRetry({ () =>
      calls += 1
      if (calls % 3 == 0) 9.0 else 0.5 // every window stays wide
    }, maxRetries = 2)
    assert(tries == 2 && calls == 9)
    assert(runs(1) == 0.5, "median of the kept set is still the clean value")
  }
}
