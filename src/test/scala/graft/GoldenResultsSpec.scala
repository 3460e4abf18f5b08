package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.JsonNode
import scala.jdk.CollectionConverters._

/** Golden-results tier (reference: tests/integration/sql_battery/test_data/
  * tests/results/ `*.results_tests` — statement + exact expected column
  * values). Unlike the DuckDB oracle gate, these expectations are CHECKED IN,
  * so a regression in the oracle harness itself (or an environment without
  * DuckDB) still catches wrong answers. Files are the `.json` files under
  * src/test/resources/golden, each shaped
  * `{"summary": ..., "statement": ..., "result": {col: [values...]}}`;
  * row order is the statement's ORDER BY.
  */
class GoldenResultsSpec extends AnyFunSuite {
  private val spark = SharedSpark.spark
  private lazy val g = {
    val g = Graft(spark)
    g.registerDir(SharedSpark.sf)
    g
  }

  private val om = new com.fasterxml.jackson.databind.ObjectMapper()
  private val dir = new java.io.File("src/test/resources/golden")

  private def canonJson(n: JsonNode): String =
    if (n.isNull) "<null>"
    else if (n.isBoolean) n.asBoolean.toString
    else if (n.isIntegralNumber) n.asLong.toString
    // integral-valued floats normalize to the integer rendering, mirroring
    // canonCell, so a golden file may store 210 or 210.0 for a double column
    else if (n.isFloatingPointNumber) canonDouble(n.asDouble)
    else n.asText

  // 12 significant digits: float aggregation order (Spark's partial sums vs
  // the reference's) legitimately moves the last ULP or two of an AVG —
  // e.g. 1.4972 vs 1.4971999999999999 — without any semantic difference
  private def canonDouble(d: Double): String = {
    if (d.isInfinite || d.isNaN) return d.toString
    val r = BigDecimal(d).round(new java.math.MathContext(12)).toDouble
    if (r == r.longValue.toDouble) r.longValue.toString else r.toString
  }

  private def canonCell(v: Any): String = v match {
    case null => "<null>"
    case b: java.lang.Boolean => b.toString
    case d: java.lang.Double => canonDouble(d)
    case f: java.lang.Float => canonDouble(f.toDouble)
    case bd: java.math.BigDecimal => canonDouble(bd.doubleValue)
    case n: java.lang.Number => n.toString
    case other => other.toString
  }

  private val files = Option(dir.listFiles()).getOrElse(Array.empty)
    .filter(_.getName.endsWith(".json")).sortBy(_.getName)

  assert(files.length >= 34, s"golden corpus shrank: ${files.length} files")

  test("ref_manifest maps every reference results file to a present twin") {
    val rows = scala.io.Source.fromFile(
      new java.io.File(dir, "ref_manifest.tsv"), "UTF-8")
      .getLines().filterNot(l => l.startsWith("#") || l.trim.isEmpty)
      .map(_.split("\t")).toSeq
    assert(rows.length == 34,
      s"reference ships 34 .results_tests files; manifest has ${rows.length} rows")
    rows.foreach { r =>
      assert(r.length >= 3, s"malformed row: ${r.mkString("|")}")
      val (twin, status) = (r(1), r(2))
      assert(Set("exact", "adapted", "blocked")(status), s"bad status in ${r(0)}")
      if (status != "blocked")
        assert(new java.io.File(dir, twin).isFile, s"missing twin $twin for ${r(0)}")
      else assert(r.length >= 4 && r(3).nonEmpty, s"blocked row ${r(0)} needs a note")
    }
    // every ported twin is manifest-tracked (promote-don't-rot)
    val tracked = rows.map(_(1)).toSet
    files.map(_.getName).filter(_.startsWith("ref_")).foreach { n =>
      assert(tracked(n), s"golden twin $n has no ref_manifest row")
    }
  }

  files.foreach { f =>
    val spec = om.readTree(f)
    test(s"${f.getName}: ${spec.get("summary").asText}") {
      val df = g.query(spec.get("statement").asText)
      val rows = df.collect()
      val result = spec.get("result")
      result.fieldNames().asScala.foreach { cn =>
        val expected = result.get(cn).elements().asScala.map(canonJson).toSeq
        val idx = df.columns.indexOf(cn)
        assert(idx >= 0, s"column `$cn` missing from ${df.columns.mkString(", ")}")
        val actual = rows.map(r => canonCell(r.get(idx))).toSeq
        assert(actual == expected,
          s"column `$cn`:\n  expected ${expected.mkString("[", ", ", "]")}" +
            s"\n  actual   ${actual.mkString("[", ", ", "]")}")
      }
    }
  }
}
