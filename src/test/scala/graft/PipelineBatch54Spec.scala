package graft

import org.scalatest.funsuite.AnyFunSuite

/** Properties of the batch-54 operators beyond the driver gate: plain-Scala
  * recomputations from the raw sf0.001 tables, the Theil additive-
  * decomposition identity, CH/ANOVA consistency, transport-metric axioms,
  * and the closed-form ridge solution checked against a hand inverse.
  */
class PipelineBatch54Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get
  private def run(n: String) = byName(n).run(spark, SharedSpark.sf).collect()

  private lazy val docs: Seq[(Long, String, String, Long)] =
    Tables.df(spark, SharedSpark.sf, "documents")
      .select("doc_id", "text", "source", "n_chars").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("p217: W1 is a nonnegative transport cost and matches a Scala ECDF integral") {
    val rows = run("p217_wasserstein_drift")
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(rows.nonEmpty)
    assert(rows.values.forall(_ >= 0), "W1 is a metric — nonnegative")
    assert(rows.values.exists(_ > 0), "some source must drift from the corpus")
    val all = docs.map(_._4).sorted
    val grid = all.distinct
    rows.foreach { case (src, w1) =>
      val mine = docs.filter(_._3 == src).map(_._4)
      var (cs, ca, acc) = (0L, 0L, 0.0)
      grid.zip(grid.tail).foreach { case (v, vNext) =>
        cs += mine.count(_ == v); ca += all.count(_ == v)
        acc += math.rint(math.abs(cs.toDouble / mine.size -
          ca.toDouble / all.size) * (vNext - v) * 1e9) / 1e9
      }
      assert(math.abs(w1 - math.rint(acc * 1e6) / 1e6) < 1e-5, s"$src: $w1 vs $acc")
    }
  }

  test("p218: CH index equals the per-dim ANOVA recompute and is positive") {
    val r = run("p218_calinski_harabasz").head
    val (k, n, ssb, ssw, ch) = (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(ssb > 0 && ssw > 0 && ch > 0)
    val e = Tables.df(spark, SharedSpark.sf, "embeddings")
      .select("label", "embedding").collect()
      .map(x => (x.getInt(0), x.getSeq[Float](1).toArray))
    assert(k == e.map(_._1).distinct.length && n == e.length)
    // micro-unit recompute, per dim: SS_tot - SS_within over label cells
    var (sst, sswAcc) = (BigDecimal(0), BigDecimal(0))
    for (d <- 0 until 64) {
      val xs = e.map { case (l, v) => (l, math.floor(v(d).toDouble * 1e6).toLong) }
      def s2n(g: Seq[Long]): BigDecimal = {
        val s = g.sum
        BigDecimal(math.rint((BigDecimal(s) * BigDecimal(s)).toDouble / g.size * 1e6) / 1e6)
      }
      val sqAll = xs.map(x => BigDecimal(x._2) * BigDecimal(x._2)).sum
      val byL = xs.groupBy(_._1).values.map(_.map(_._2).toSeq)
      val s2nAll = byL.map(s2n).sum
      sst += BigDecimal(math.rint((sqAll - s2n(xs.map(_._2).toSeq)).toDouble * 1e6) / 1e6)
      sswAcc += BigDecimal(math.rint((sqAll - s2nAll).toDouble * 1e6) / 1e6)
    }
    val wantSsb = (sst - sswAcc).toDouble / 1e12
    val wantSsw = sswAcc.toDouble / 1e12
    assert(math.abs(ssb - wantSsb) < 1e-4, s"SSB $ssb vs $wantSsb")
    assert(math.abs(ssw - wantSsw) < 1e-4, s"SSW $ssw vs $wantSsw")
    assert(math.abs(ch - (wantSsb / (k - 1)) / (wantSsw / (n - k))) < 1e-4)
  }

  test("p219: ridge solution satisfies the regularized normal equations") {
    val r = run("p219_ridge_normal_eq").head
    val (n, b1, b2, icpt, r2) = (r.getLong(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4))
    assert(n == docs.length)
    assert(r2 > 0 && r2 <= 1, s"training R2 $r2 out of (0,1]")
    // recompute centered sufficient sums
    val f = docs.map { case (_, text, _, nc) =>
      val t = text.toLowerCase.split("\\s+", -1)
      (t.length.toDouble, t.distinct.length.toDouble, nc.toDouble)
    }
    val m = f.size.toDouble
    def mean(g: Seq[Double]) = g.sum / m
    val (m1, m2, my) = (mean(f.map(_._1)), mean(f.map(_._2)), mean(f.map(_._3)))
    def cov(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum - a.sum * b.sum / m
    val (c11, c22, c12) = (cov(f.map(_._1), f.map(_._1)),
      cov(f.map(_._2), f.map(_._2)), cov(f.map(_._1), f.map(_._2)))
    val (c1y, c2y) = (cov(f.map(_._1), f.map(_._3)), cov(f.map(_._2), f.map(_._3)))
    // (C + λI) β = c_y within numeric tolerance of the 6dp-rounded betas
    val lam = 1000.0
    assert(math.abs((c11 + lam) * b1 + c12 * b2 - c1y) < math.abs(c1y) * 1e-3 + 1.0,
      "normal equation 1")
    assert(math.abs(c12 * b1 + (c22 + lam) * b2 - c2y) < math.abs(c2y) * 1e-3 + 1.0,
      "normal equation 2")
    assert(math.abs(icpt - (my - b1 * m1 - b2 * m2)) < 1e-3, "intercept")
  }

  test("p220: tau-b within [-1,1], pair accounting exact, sign matches recompute") {
    val r = run("p220_kendall_rank_stability").head
    val (np, c, d, tq, tv, tau) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getDouble(5))
    val docLang = Tables.df(spark, SharedSpark.sf, "documents")
      .select("source", "lang", "n_chars").collect().toSeq
      .map(x => (x.getString(0), x.getString(1), x.getLong(2)))
    val bySrc = docLang.groupBy(_._1).view.mapValues { g =>
      (g.map(_._3).sum.toDouble / g.size,
        g.count(_._2 == "en").toDouble / g.size)
    }.toMap
    val k = bySrc.size.toLong
    assert(np == k * (k - 1) / 2, "pair count")
    assert(tau >= -1 - 1e-9 && tau <= 1 + 1e-9)
    assert(tv < np, "en-share must vary across sources — fixture degenerate")
    var (wc, wd, wtq, wtv) = (0L, 0L, 0L, 0L)
    val srcs = bySrc.keys.toSeq.sorted
    for (i <- srcs.indices; j <- i + 1 until srcs.size) {
      val (qa, ea) = bySrc(srcs(i)); val (qb, eb) = bySrc(srcs(j))
      val prod = (qa - qb) * (ea - eb)
      if (prod > 0) wc += 1 else if (prod < 0) wd += 1
      if (qa == qb) wtq += 1
      if (ea == eb) wtv += 1
    }
    assert((c, d, tq, tv) == ((wc, wd, wtq, wtv)))
    val want = (wc - wd).toDouble / math.sqrt((np - wtq).toDouble * (np - wtv))
    assert(math.abs(tau - want) < 1e-6)
  }

  test("p221: Theil decomposition is additive — T_total = Σ between_terms + Σ share·T_g") {
    val rows = run("p221_theil_decomposition")
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3, "shares sum to 1")
    // plain-Scala total Theil over doc token counts
    val xs = docs.map(_._2.toLowerCase.split("\\s+", -1).length.toDouble)
    val (nTot, xTot) = (xs.size.toDouble, xs.sum)
    val mu = xTot / nTot
    val tTotal = xs.filter(_ > 0).map(x => (x / xTot) * math.log(x / mu)).sum
    val decomposed = rows.map { case (_, _, share, tg, btw) => btw + share * tg }.sum
    assert(math.abs(tTotal - decomposed) < 1e-4,
      s"decomposition broken: total $tTotal vs $decomposed")
    rows.foreach { case (src, _, _, tg, _) =>
      assert(tg >= -1e-9, s"$src: within-group Theil must be nonnegative")
    }
  }

  test("p222: Mann-Kendall S and tie-corrected variance match a Scala recompute") {
    val r = run("p222_mann_kendall_trend").head
    val (nd, sStat, varS, z) = (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getDouble(3))
    val days = Tables.df(spark, SharedSpark.sf, "events")
      .selectExpr("cast(ts as date) as d").groupBy("d").count()
      .collect().map(x => (x.getDate(0).toString, x.getLong(1))).sortBy(_._1)
    assert(nd == days.length)
    var s = 0L
    for (i <- days.indices; j <- i + 1 until days.length)
      s += java.lang.Long.signum(days(j)._2 - days(i)._2)
    assert(sStat == s, s"S $sStat vs $s")
    val n = days.length.toDouble
    val tie = days.groupBy(_._2).values.map(_.size.toLong).filter(_ > 1)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    val wantVar = (n * (n - 1) * (2 * n + 5) - tie) / 18
    assert(math.abs(varS - math.rint(wantVar * 1e6) / 1e6) < 1e-6)
    val wantZ = if (s > 0) (s - 1) / math.sqrt(wantVar)
      else if (s < 0) (s + 1) / math.sqrt(wantVar) else 0.0
    assert(math.abs(z - math.rint(wantZ * 1e6) / 1e6) < 1e-6)
  }
}
