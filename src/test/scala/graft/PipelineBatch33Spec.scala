package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the batch-33 operators beyond the driver gate: the PCA
  * projection statistics behave like second moments of a centered cloud and
  * the reported eigenvalue tracks an independently-converged driver-side
  * power iteration; the stump split reproduces an independent brute-force
  * histogram search; the JS matrix is a well-formed bounded divergence.
  */
class PipelineBatch33Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  /** collected (label, x[64]) with the op's 6dp feature grid applied */
  private lazy val cloud: Array[(Int, Array[Double])] =
    Tables.df(spark, SharedSpark.sf, "embeddings")
      .select(col("label"), col("embedding"))
      .collect()
      .map { r =>
        val xs = r.getSeq[Float](1).map(f =>
          BigDecimal(f.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble).toArray
        (r.getInt(0), xs)
      }

  test("p125: projection moments are consistent and eigenvalue matches a converged fit") {
    val rows = byName("p125_pca_power").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val eig = rows.head._5
    assert(rows.forall(_._5 == eig), "eigenvalue must be a global constant column")
    assert(eig > 0.0)
    rows.foreach { case (lbl, n, mean, rms, _) =>
      assert(n > 0, s"label $lbl empty")
      assert(rms * rms >= mean * mean - 1e-9, s"label $lbl: rms below |mean|")
    }
    val nTot = rows.map(_._2).sum
    assert(nTot == cloud.length)
    // centered cloud: the count-weighted projection mean is ~0
    val grandMean = rows.map { case (_, n, m, _, _) => n * m }.sum / nTot
    assert(math.abs(grandMean) < 1e-3, s"projections not centered: $grandMean")
    // independent driver-side power iteration, run far past the op's 3 steps
    val d = 64
    val n = cloud.length
    val mu = Array.tabulate(d)(i => cloud.map(_._2(i)).sum / n)
    val xc = cloud.map { case (_, xs) => Array.tabulate(d)(i => xs(i) - mu(i)) }
    var v = Array.fill(d)(1.0)
    for (_ <- 1 to 50) {
      val g = Array.fill(d)(0.0)
      xc.foreach { row =>
        val dot = (0 until d).map(i => row(i) * v(i)).sum
        (0 until d).foreach(i => g(i) += dot * row(i))
      }
      val nrm = math.sqrt(g.map(x => x * x).sum)
      v = g.map(_ / nrm)
    }
    val lambda = xc.map { row =>
      val p = (0 until d).map(i => row(i) * v(i)).sum; p * p
    }.sum / n
    // 3 power iterations need not be fully converged — at this tiny SF
    // (~50 vecs in 64 dims) the eigengap is narrow, so allow a loose 70%
    // floor; the ceiling is tight (a power iterate can never overshoot the
    // top eigenvalue beyond arithmetic noise)
    assert(eig <= lambda * 1.05 + 1e-6, s"reported $eig above converged $lambda")
    assert(eig >= lambda * 0.70, s"reported $eig far below converged $lambda")
    // and the projection second moment must track the same quantity
    val msTot = rows.map { case (_, nl, _, rms, _) => nl * rms * rms }.sum / nTot
    assert(msTot >= lambda * 0.70 && msTot <= lambda * 1.05 + 1e-6,
      s"mean-square projection $msTot vs converged $lambda")
  }

  test("p126: top splits match an independent brute-force histogram search") {
    val rows = byName("p126_stump_split").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getDouble(8)))
    assert(rows.length == 5)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3, 4, 5))
    // brute-force the same histogram in memory
    val d = 64
    val hist = Array.fill(d, 16, 2)(0L)
    cloud.foreach { case (lbl, xs) =>
      val y = if (lbl == 0) 1 else 0
      (0 until d).foreach { i =>
        val b = math.min(math.max(math.floor((xs(i) + 2.0) / 0.25).toInt, 0), 15)
        hist(i)(b)(y) += 1
      }
    }
    val cands = for {
      i <- 0 until d
      b <- 0 until 15
      cp = (0 to b).map(hist(i)(_)(1)).sum
      cn = (0 to b).map(hist(i)(_)(0)).sum
      tp = (0 until 16).map(hist(i)(_)(1)).sum
      tn = (0 until 16).map(hist(i)(_)(0)).sum
      nl = cp + cn
      nr = tp + tn - nl
      if nl >= 10 && nr >= 10
    } yield {
      val tt = (tp + tn).toDouble
      def gini(p: Long, q: Long) = {
        val s = (p + q).toDouble
        1.0 - (p / s) * (p / s) - (q / s) * (q / s)
      }
      val gain = gini(tp, tn) - (nl / tt) * gini(cp, cn) - (nr / tt) * gini(tp - cp, tn - cn)
      (i, b, nl, nr, cp, gain)
    }
    val expect = cands.sortBy { case (i, b, _, _, _, g) => (-g, i, b) }.take(5)
    rows.zip(expect).foreach { case ((_, dim, bin, th, nl, nr, pl, pr, gain),
                                     (ei, eb, enl, enr, ecp, eg)) =>
      assert(dim == ei && bin == eb, s"split ($dim,$bin) != brute ($ei,$eb)")
      assert(nl == enl && nr == enr && pl == ecp)
      assert(math.abs(gain - eg) < 1e-5, s"gain $gain vs brute $eg")
      assert(math.abs(th - (-2.0 + 0.25 * (bin + 1))) < 1e-12)
      assert(pr >= 0 && pr <= nr)
    }
  }

  test("p127: JS matrix is bounded, symmetric-by-construction, and complete") {
    val rows = byName("p127_js_source_divergence").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val nSources = Tables.df(spark, SharedSpark.sf, "documents")
      .select(col("source")).distinct().count().toInt
    assert(rows.length == nSources * (nSources - 1) / 2,
      s"expected all ${nSources * (nSources - 1) / 2} unordered pairs")
    rows.foreach { case (a, b, shared, js) =>
      assert(a < b, s"pair ($a,$b) not in canonical order")
      assert(shared >= 0 && shared <= 200)
      assert(js >= -1e-9 && js <= math.log(2.0) + 1e-6,
        s"($a,$b): js $js outside [0, ln 2]")
    }
  }
}
