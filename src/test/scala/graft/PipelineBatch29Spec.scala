package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the batch-29 operators beyond the driver gate: DSIR
  * weights actually favor the target slice, the MAD screen respects its
  * fence, the CMS never undercounts, and the k-center traversal's radii
  * are non-increasing and its picks distinct.
  */
class PipelineBatch29Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  test("p111: mean log-importance of the target slice exceeds the rest") {
    val rows = byName("p111_dsir_importance").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val (en, rest) = rows.partition(_._2 == "en")
    assert(en.nonEmpty && rest.nonEmpty, "need both slices at spec scale")
    val meanEn = en.map(_._4).sum / en.length
    val meanRest = rest.map(_._4).sum / rest.length
    assert(meanEn > meanRest,
      s"DSIR inverted: target mean $meanEn <= raw-rest mean $meanRest")
    // docs cover the whole corpus exactly once
    val n = Tables.df(spark, SharedSpark.sf, "documents").count()
    assert(rows.length == n && rows.map(_._1).distinct.length == rows.length)
  }

  test("p112: every flagged event is strictly outside the 3.5 MAD fence") {
    val rows = byName("p112_mad_outliers").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty, "no outliers at spec scale — fence degenerate")
    rows.foreach { case (id, t, _, rz) =>
      assert(math.abs(rz) > 3.5 - 1e-4, s"event $id ($t): rz=$rz inside fence")
    }
    // a screen, not a filter: flags are a small minority
    val n = Tables.df(spark, SharedSpark.sf, "events").count()
    assert(rows.length < n / 10, s"${rows.length} of $n flagged")
  }

  test("p113: CMS estimates never undercount and cover the exact top-20") {
    val rows = byName("p113_cms_heavy_hitters").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 20)
    rows.foreach { case (tok, c, est, over) =>
      assert(est >= c, s"$tok: CMS undercounts ($est < $c)")
      assert(over == est - c, s"$tok: overcount inconsistent")
    }
    // heavy hitters dominate the sketch's collision noise: estimates stay
    // within 2x of truth for the top tokens on this vocabulary
    rows.foreach { case (tok, c, est, _) =>
      assert(est <= 2 * c, s"$tok: estimate $est implausibly far from $c")
    }
  }

  test("p114: selection radii are non-increasing and picks are distinct") {
    val rows = byName("p114_kcenter_coreset").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 8)
    assert(rows.map(_._1).toSeq == (0 until 8), "iterations not 0..7")
    assert(rows.map(_._2).distinct.length == 8, "a vector was picked twice")
    // farthest-point property: each new pick's distance to the chosen set
    // can only shrink as the set grows (first row is the seed at d=0)
    val ds = rows.sortBy(_._1).map(_._3).drop(1)
    assert(ds.zip(ds.tail).forall { case (a, b) => b <= a + 1e-9 },
      s"radii not non-increasing: ${ds.mkString(",")}")
    assert(ds.head > 0, "degenerate: all embeddings identical")
  }
}
