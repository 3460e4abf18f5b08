package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the batch-15 operators beyond the driver gate: moment
  * sanity for embedding norms, triangle/wedge inequalities for the
  * near-dup graph census, sweep monotonicity for minhash calibration, and
  * per-group cardinality for the lateral top-N.
  */
class PipelineBatch15Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  test("p72: norm stats cover the table with coherent extrema") {
    val rows = byName("p72_embed_norms").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5)))
    val n = Tables.df(spark, SharedSpark.sf, "embeddings").count()
    assert(rows.map(_._2).sum == n, "per-label counts do not cover the table")
    rows.foreach { case (lab, cnt, mean, lo, hi, out) =>
      assert(lo <= mean + 1e-6 && mean <= hi + 1e-6, s"label $lab: mean outside [min,max]")
      assert(lo > 0, s"label $lab: zero/negative norm — degenerate vector leaked")
      assert(out >= 0 && out <= cnt, s"label $lab: outlier count outside [0,n]")
    }
    // a |z|>2 cut keeps outliers a small minority under any unimodal law
    assert(rows.map(_._6).sum < n / 4, "too many outliers — moment pipeline suspect")
  }

  test("p73: triangle census satisfies graph inequalities") {
    val r = byName("p73_dupgraph_triangles").run(spark, SharedSpark.sf).collect()
    assert(r.length == 1)
    val (nodes, edges, wedges, tris) =
      (r.head.getLong(0), r.head.getLong(1), r.head.getLong(2), r.head.getLong(3))
    assert(nodes >= 2 && edges >= 1, "candidate graph unexpectedly empty")
    assert(edges <= nodes.toLong * (nodes - 1) / 2, "more edges than node pairs")
    assert(3 * tris <= wedges, "each triangle closes exactly 3 wedges — count inconsistent")
    if (wedges > 0) {
      val cc = r.head.getDouble(4)
      assert(cc >= 0 && cc <= 1 + 1e-9, "clustering coefficient outside [0,1]")
      assert(math.abs(cc - 3.0 * tris / wedges) < 1e-5, "coefficient inconsistent with counts")
    }
  }

  test("p74: calibration sweep is monotone and self-consistent") {
    val rows = byName("p74_minhash_calibration").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0.25, 0.5, 0.75, 1.0))
    assert(rows.map(_._2).distinct.length == 1, "candidate population differs across thresholds")
    rows.foreach { case (t, cand, pred, tp, prec, rec) =>
      assert(pred <= cand && tp <= pred, s"t=$t: counts inconsistent")
      prec.foreach(p => assert(p >= 0 && p <= 1, s"t=$t: precision outside [0,1]"))
      rec.foreach(x => assert(x >= 0 && x <= 1, s"t=$t: recall outside [0,1]"))
    }
    rows.zip(rows.tail).foreach { case ((t1, _, p1, tp1, _, _), (t2, _, p2, tp2, _, _)) =>
      assert(p2 <= p1, s"n_pred increased from t=$t1 to t=$t2")
      assert(tp2 <= tp1, s"tp increased from t=$t1 to t=$t2")
    }
  }

  test("q93: lateral yields at most 2 alphabetically-first nations per region") {
    val rows = byName("q93_lateral_topn").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val regions = Tables.df(spark, SharedSpark.sf, "region").count()
    assert(rows.length <= 2 * regions)
    val nation = Tables.df(spark, SharedSpark.sf, "nation")
      .join(Tables.df(spark, SharedSpark.sf, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("n_name"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    rows.groupBy(_._1).foreach { case (rn, rs) =>
      val expect = nation.filter(_._1 == rn).map(_._2).sorted.take(2)
      assert(rs.map(_._2).sorted.sameElements(expect),
        s"$rn: lateral rows are not the 2 alphabetically-first nations")
    }
  }
}
