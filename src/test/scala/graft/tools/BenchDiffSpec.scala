package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** BenchDiff contract: the pairwise verdict machinery and the round-16
  * N-cut series mode (r15 VERDICT #5 — same-day cuts heat monotonically,
  * so pairwise comparisons against different cuts yield different
  * verdicts; the series verdict must be single-valued over all cuts).
  */
class BenchDiffSpec extends AnyFunSuite {

  private def artifact(path: java.nio.file.Path, q1: Double, q2: Double,
      cb1: Double, canary: Double, cbCanary: Double): String = {
    val json =
      s"""{"metric":"total","official":true,
         |"queries":{"qa":{"median":$q1,"min":${q1 * 0.9}},
         |"qb":{"median":$q2,"min":${q2 * 0.9}}},
         |"clickbench":{"cb01":{"median":$cb1,"min":${cb1 * 0.9}}},
         |"canary_median":$canary,"cb_canary_median":$cbCanary}""".stripMargin
    java.nio.file.Files.write(path, json.getBytes("UTF-8"))
    path.toString
  }

  test("pairwise render: flat cuts read FLAT, heated candidate reads via normalization") {
    val dir = java.nio.file.Files.createTempDirectory("benchdiff")
    val a = artifact(dir.resolve("a.json"), 1.0, 2.0, 0.5, 0.40, 0.40)
    // candidate 50% hotter everywhere INCLUDING the canary -> normalized flat
    val b = artifact(dir.resolve("b.json"), 1.5, 3.0, 0.75, 0.60, 0.60)
    val md = BenchDiff.render(a, b)
    assert(md.contains("non-cb verdict: FLAT"), md)
    assert(md.contains("cb verdict: FLAT"), md)
  }

  test("pairwise render: a real regression survives normalization") {
    val dir = java.nio.file.Files.createTempDirectory("benchdiff")
    val a = artifact(dir.resolve("a.json"), 1.0, 2.0, 0.5, 0.40, 0.40)
    val b = artifact(dir.resolve("b.json"), 2.0, 4.0, 1.0, 0.40, 0.40)
    val md = BenchDiff.render(a, b)
    assert(md.contains("non-cb verdict: REGRESSED"), md)
    assert(md.contains("cb verdict: REGRESSED"), md)
  }

  test("malformed artifact entry fails loudly instead of zeroing totals") {
    val dir = java.nio.file.Files.createTempDirectory("benchdiff")
    val bad = dir.resolve("bad.json")
    java.nio.file.Files.write(bad,
      """{"queries":{"qa":{"min":1.0}},"clickbench":{}}""".getBytes("UTF-8"))
    val ok = artifact(dir.resolve("ok.json"), 1.0, 2.0, 0.5, 0.4, 0.4)
    val e = intercept[IllegalArgumentException] {
      BenchDiff.render(bad.toString, ok)
    }
    assert(e.getMessage.contains("lacks median"))
  }

  test("series verdict uses the min across each side's cuts") {
    val dir = java.nio.file.Files.createTempDirectory("benchdiff")
    // baseline round: one cool cut
    val b1 = artifact(dir.resolve("b1.json"), 1.0, 2.0, 0.5, 0.40, 0.40)
    // candidate round: first cut hot (+60%), second cut cool (flat) — the
    // series verdict must read the cool floor, not the hot cut
    val c1 = artifact(dir.resolve("c1.json"), 1.6, 3.2, 0.8, 0.40, 0.40)
    val c2 = artifact(dir.resolve("c2.json"), 1.01, 2.01, 0.505, 0.40, 0.40)
    val md = BenchDiff.renderSeries(Seq(b1), Seq(c1, c2))
    assert(md.contains("non-cb verdict: FLAT"), md)
    assert(md.contains("cb verdict: FLAT"), md)
    assert(md.contains("min of 2"), md)
    // the per-cut table shows the heat trend the verdict adjudicates
    assert(md.contains("c1.json") && md.contains("c2.json"), md)
  }
}
