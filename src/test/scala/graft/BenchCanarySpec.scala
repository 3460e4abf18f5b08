package graft

import org.scalatest.funsuite.AnyFunSuite

/** Table-driven cases for the bench load flag — the instrument guarding the
  * official numbers must itself be regression-guarded. */
class BenchCanarySpec extends AnyFunSuite {

  private val cases: Seq[(String, Seq[Double], Boolean)] = Seq(
    ("all-flat",
      Seq(0.20, 0.20, 0.21, 0.19, 0.20, 0.20), false),
    ("empty / single sample never flag",
      Seq(0.20), false),
    ("uniform mid-session aging (~1.5x) is not load",
      Seq(0.20, 0.24, 0.28, 0.30, 0.30, 0.31), false),
    ("single spike is scheduling noise",
      Seq(0.20, 0.20, 0.55, 0.20, 0.21, 0.20), false),
    ("two consecutive spikes flag",
      Seq(0.20, 0.20, 0.55, 0.58, 0.21, 0.20), true),
    ("spikes separated by a calm sample do not flag",
      Seq(0.20, 0.55, 0.20, 0.55, 0.20, 0.20), false),
    ("episode at the very end flags",
      Seq(0.20, 0.20, 0.20, 0.20, 0.60, 0.62), true),
    ("sustained plateau over most of the run flags via the baseline guard",
      // median (~0.62) is inside the episode so the spike rule is blind,
      // but median > 2.5x the 0.20 clean-start baseline (median of first 3)
      Seq(0.20, 0.21, 0.20, 0.62, 0.63, 0.62, 0.63), true),
    ("whole-session doubling (2x) stays under the 2.5x plateau guard",
      Seq(0.20, 0.40, 0.41, 0.40, 0.41, 0.40), false),
    ("anomalously fast single cold sample does not flag a clean aged run",
      // the real 164-query clean-run shape that false-positived when the
      // baseline was samples.head alone: 0.154 cold start, ~0.39 median
      Seq(0.15, 0.39, 0.31, 0.33, 0.47, 0.32, 0.56, 0.50, 0.28, 0.43,
        0.30, 0.29, 0.42, 0.41, 0.35, 0.40, 0.31, 0.30, 0.36, 0.37,
        0.44, 0.43, 0.45, 0.46, 0.41, 0.12), false),
    // Documented limit: an episode starting before the third sample and
    // lasting the whole run is absorbed into the baseline — one cold sample
    // is not evidence of machine speed, so this is indistinguishable from a
    // slow machine and intentionally NOT flagged.
    ("whole-run episode from sample 2 is absorbed into the baseline",
      Seq(0.20, 0.62, 0.63, 0.61, 0.62, 0.63), false)
  )

  cases.foreach { case (name, samples, want) =>
    test(s"$name -> load_flag=$want") {
      assert(BenchCanary.loadFlag(samples) == want)
    }
  }

  test("sessionMedian is the upper median of the sorted samples") {
    assert(BenchCanary.sessionMedian(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(BenchCanary.sessionMedian(Seq(4.0, 1.0, 2.0, 3.0)) == 3.0)
    assert(BenchCanary.sessionMedian(Nil) == 0.0)
  }

  test("factors are tunable") {
    val s = Seq(0.20, 0.30, 0.31, 0.20, 0.20, 0.20)
    assert(!BenchCanary.loadFlag(s))
    assert(BenchCanary.loadFlag(s, spikeFactor = 1.2))
  }
}
