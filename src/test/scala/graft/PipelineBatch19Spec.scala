package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the batch-19 operators beyond the driver gate:
  * concentration-metric laws (Gini/HHI bounds and their degenerate cases)
  * and order/counting laws for the inter-event gap distribution.
  */
class PipelineBatch19Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  test("p87: Gini and HHI obey their analytic bounds on both axes") {
    val rows = byName("p87_source_concentration").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq.sorted == Seq("lang", "source"))
    rows.foreach { case (axis, n, gini, hhi, top1) =>
      assert(n > 1, s"$axis: degenerate axis")
      assert(gini >= 0 && gini <= 1.0 - 1.0 / n + 1e-9,
        s"$axis: Gini outside [0, 1-1/n]")
      // HHI ∈ [1/n (uniform), 1 (monopoly)]; top1 ∈ [1/n, 1]
      assert(hhi >= 1.0 / n - 1e-9 && hhi <= 1.0 + 1e-9, s"$axis: HHI out of range")
      assert(top1 >= 1.0 / n - 1e-9 && top1 <= 1.0 + 1e-9, s"$axis: top1 out of range")
      // monopoly share bounds concentration from below: HHI >= top1^2
      assert(hhi >= top1 * top1 - 1e-9, s"$axis: HHI below top1^2")
    }
    // 20 sources vs 5 langs: the source axis must be the finer partition
    val byAxis = rows.map(r => r._1 -> r._2).toMap
    assert(byAxis("source") > byAxis("lang"))
  }

  test("p88: gap quantiles are ordered, and gap counts account for every event") {
    val rows = byName("p88_event_gap_quantiles").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, n, p50, p90, p99) =>
      assert(n > 0, s"$t: no gaps")
      assert(p50 >= 0 && p50 <= p90 && p90 <= p99, s"$t: quantiles out of order")
    }
    // total gaps = events - distinct users (each user's first event has none)
    val ev = Tables.df(spark, SharedSpark.sf, "events")
    val r = ev.agg(count(lit(1)), countDistinct(col("user_id"))).head()
    assert(rows.map(_._2).sum == r.getLong(0) - r.getLong(1),
      "gap count does not match events minus first-events")
  }
}
