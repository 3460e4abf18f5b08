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

  private def canonDouble(d: Double): String =
    if (!d.isInfinite && !d.isNaN && d == d.longValue.toDouble) d.longValue.toString
    else d.toString

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
