package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the batch-23 operators beyond the driver gate: regression
  * statistic laws for quality drift and monotone-recall laws for the IVF
  * probe sweep.
  */
class PipelineBatch23Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  test("p98: one row per source with bounded correlation and consistent signs") {
    val df = byName("p98_quality_drift").run(spark, SharedSpark.sf)
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)),
      if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    val nSources = Tables.df(spark, SharedSpark.sf, "documents")
      .select(countDistinct(col("source"))).head().getLong(0)
    assert(rows.length == nSources)
    rows.foreach { case (src, n, slope, corr) =>
      assert(n > 0)
      corr.foreach(c => assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9,
        s"$src: correlation outside [-1,1]"))
      // slope and correlation share the covariance numerator → same sign
      for (sl <- slope; c <- corr if math.abs(c) > 1e-6)
        assert(sl.sign == c.sign, s"$src: slope and correlation disagree in sign")
      // multi-doc sources have x-variance, so the stats must be defined
      if (n > 1) assert(slope.isDefined, s"$src: slope undefined despite $n docs")
    }
  }

  test("p99: recall is nondecreasing in the probe budget") {
    val rows = byName("p99_ivf_probe_sweep").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 4))
    rows.foreach { case (p, hits, rec) =>
      assert(hits >= 0 && hits <= 25, s"probes=$p: hits outside [0, queries*k]")
      assert(math.abs(rec - hits / 25.0) < 1e-9, s"probes=$p: recall inconsistent")
    }
    rows.zip(rows.tail).foreach { case ((p1, h1, _), (p2, h2, _)) =>
      assert(h2 >= h1, s"recall dropped from $p1 to $p2 probes — candidate sets must nest")
    }
    assert(rows.last._2 > 0, "4-probe IVF recalled nothing — index suspect")
  }
}
