package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the batch-28 operators beyond the driver gate: the trim
  * quantile actually cuts ~P10 of blocks, dedup conservation, and the
  * outlier screen's z-threshold contract.
  */
class PipelineBatch28Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  test("p108: corpus-wide trimmed mass sits at the P10 cut, never above P10+ties") {
    val rows = byName("p108_block_lm_trim").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, kept, frac) =>
      assert(n > 0 && kept >= 0 && kept <= n, s"doc $id")
      assert(math.abs(frac - kept.toDouble / n) < 1e-6, s"doc $id: frac off")
    }
    val total = rows.map(_._2).sum.toDouble
    val trimmed = rows.map(r => r._2 - r._3).sum.toDouble
    // quantile_cont(0.10) guarantees >= ~10% of blocks sit at-or-under the
    // cut; with score >= cut kept, trimmed mass is ≤ ~10% + tie slack and
    // strictly positive on any non-degenerate corpus
    assert(trimmed > 0, "nothing trimmed — cut degenerate")
    assert(trimmed / total <= 0.12, s"trimmed ${trimmed / total} far above P10")
  }

  test("p109: dedup conserves events and never removes the last of a kind") {
    val rows = byName("p109_event_window_dedup").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, n, kept, removed, rate) =>
      assert(kept + removed == n, s"$t: not conserved")
      assert(kept > 0, s"$t: removed everything")
      assert(math.abs(rate - removed.toDouble / n) < 1e-6, s"$t: rate off")
    }
    // total events must equal the raw table count (no row silently dropped)
    val raw = Tables.df(spark, SharedSpark.sf, "events").count()
    assert(rows.map(_._2).sum == raw, "event conservation broken")
  }

  test("p110: every flagged vector is strictly 2.5σ under its label mean") {
    val out = byName("p110_centroid_outliers").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.nonEmpty, "no outliers at spec scale — threshold too tight")
    out.foreach { case (label, id, cos, z) =>
      assert(z < -2.5 + 1e-4, s"label $label vec $id: z=$z not under -2.5")
      assert(cos >= -1.0 - 1e-9 && cos <= 1.0 + 1e-9)
    }
    // flagged set is a small minority (it's an outlier screen, not a filter)
    val nVecs = Tables.df(spark, SharedSpark.sf, "embeddings").count()
    assert(out.length < nVecs / 20, s"${out.length} of $nVecs flagged")
  }
}
