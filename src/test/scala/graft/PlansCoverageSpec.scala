package graft

import org.scalatest.funsuite.AnyFunSuite

/** PLANS.md is the scale-review backbone: every gate query must have a
  * current plan-audit row, or scale hazards ship unreviewed (r11 shipped
  * with p115–p118 missing from the audit). This spec pins the PLANS.md row
  * set to `SparkEntry.queries.keySet` so the file cannot rot — regenerate
  * with `sbt "runMain graft.PlanAudit"` whenever a query is added/removed.
  */
class PlansCoverageSpec extends AnyFunSuite {

  test("PLANS.md rows cover exactly the registered gate queries") {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("PLANS.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val rows =
      text.linesIterator
        .filter(l => l.startsWith("| ") && !l.startsWith("| query") && !l.startsWith("|---"))
        .map(_.split("\\|")(1).trim).toSet
    val queries = SparkEntry.queries.keySet
    val missing = queries -- rows
    val stale = rows -- queries
    assert(missing.isEmpty && stale.isEmpty,
      s"PLANS.md out of date — missing rows: ${missing.toSeq.sorted.mkString(", ")}; " +
        s"stale rows: ${stale.toSeq.sorted.mkString(", ")}. " +
        "Regenerate with `sbt \"runMain graft.PlanAudit\"`.")
  }
}
