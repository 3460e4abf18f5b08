package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.BenchDiff

/** The cross-cut adjudication tool is part of the bench protocol record —
  * its series mode must fail loudly on vacuous input instead of emitting a
  * FLAT verdict over an empty intersection (r16 ADVICE), and report what
  * the coverage intersection dropped. */
class BenchDiffSpec extends AnyFunSuite {

  private def artifact(queries: Map[String, Double], cb: Map[String, Double],
      canary: Double): String = {
    def sec(m: Map[String, Double]) = m.map { case (k, v) =>
      s""""$k":{"median":$v,"min":$v}"""
    }.mkString("{", ",", "}")
    val f = java.nio.file.Files.createTempFile("benchdiff", ".json")
    val json = s"""{"metric":"total","official":true,"queries":${sec(queries)},""" +
      s""""clickbench":${sec(cb)},"canary_median":$canary,"cb_canary_median":$canary}"""
    java.nio.file.Files.write(f, json.getBytes("UTF-8"))
    f.toString
  }

  private val fullA = artifact(Map("q01" -> 1.0, "q02" -> 2.0),
    Map("cb1" -> 0.3), canary = 0.40)
  private val fullB = artifact(Map("q01" -> 1.1, "q02" -> 1.9),
    Map("cb1" -> 0.28), canary = 0.42)

  test("pairwise diff renders verdicts for well-formed cuts") {
    val md = BenchDiff.render(fullA, fullB)
    assert(md.contains("non-cb verdict"))
    assert(md.contains("cb verdict"))
  }

  test("a cb-only cut in a series fails loudly instead of a vacuous verdict") {
    val cbOnly = artifact(Map.empty, Map("cb1" -> 0.3), canary = 0.41)
    val e = intercept[IllegalArgumentException] {
      BenchDiff.renderSeries(Seq(fullA), Seq(fullB, cbOnly))
    }
    assert(e.getMessage.contains("no non-cb queries"))
    assert(e.getMessage.contains("vacuous"))
  }

  test("partial-coverage intersection is reported, not silent") {
    val partial = artifact(Map("q01" -> 1.05), Map("cb1" -> 0.29), canary = 0.39)
    val md = BenchDiff.renderSeries(Seq(fullA), Seq(fullB, partial))
    assert(md.contains("dropped by the coverage intersection"))
    assert(md.contains("q02"))
  }

  test("full-coverage series carries no dropped-queries note") {
    val md = BenchDiff.renderSeries(Seq(fullA), Seq(fullB))
    assert(!md.contains("dropped by the coverage intersection"))
  }
}
