package graft

import org.scalatest.funsuite.AnyFunSuite

/** Properties of the batch-58 operators beyond the driver gate: the Gini
  * rank-sum identity against the O(n²) textbook definition, Friedman/W
  * against a direct midrank recompute, JT pair counts against the literal
  * pair space, the Scholz–Stephens A²akN against a direct per-value
  * recompute, Gumbel moment identities, and Pettitt's U against the
  * two-sided split-sum definition — with FixtureVacuity probes throughout.
  */
class PipelineBatch58Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get
  private def df(n: String) = byName(n).run(spark, SharedSpark.sf)
  private def run(n: String) = df(n).collect()

  private lazy val docs: Seq[(String, String, Long)] =
    Tables.df(spark, SharedSpark.sf, "documents")
      .select("source", "lang", "n_chars").collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))

  private lazy val dailyCounts: Seq[(String, Long)] =
    Tables.df(spark, SharedSpark.sf, "events")
      .selectExpr("cast(ts as date) as d").groupBy("d").count()
      .collect().toSeq.map(r => (r.getDate(0).toString, r.getLong(1)))
      .sortBy(_._1)

  test("p241: gini matches the O(n^2) mean-absolute-difference definition") {
    val rows = run("p241_gini_lorenz").map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val bySrc = docs.groupBy(_._1)
    rows.foreach { case (src, n, t, gini, l50) =>
      val xs = bySrc(src).map(_._3)
      assert(n == xs.size && t == xs.sum, src)
      // textbook: G = sum_{i,j} |xi-xj| / (2 n^2 mu)
      val sad = (for (a <- xs; b <- xs) yield math.abs(a - b)).sum
      val want = sad.toDouble / (2.0 * n * t)
      assert(math.abs(gini - want) < 2e-6, s"$src: $gini vs $want")
      assert(gini >= 0 && gini < 1, src)
      // Lorenz checkpoint: char share of the floor(n/2) shortest docs
      val k = (n / 2).toInt
      val wantL = xs.sorted.take(k).sum.toDouble / t
      assert(math.abs(l50 - wantL) < 2e-6, s"$src: $l50 vs $wantL")
      assert(l50 > 0 && l50 < 0.5 + 1e-9, src) // bottom half holds <= half
    }
    FixtureVacuity.assertDiscriminates(df("p241_gini_lorenz"), "gini", 3)
  }

  test("p242: Friedman Q and Kendall's W match a direct midrank recompute") {
    val r = run("p242_friedman_test").head
    val (n, k, q, w) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    val ev = Tables.df(spark, SharedSpark.sf, "events")
      .selectExpr("cast(ts as date) as d", "event_type as et").collect()
      .map(x => (x.getDate(0).toString, x.getString(1)))
    val days = ev.map(_._1).distinct.sorted
    val types = ev.map(_._2).distinct.sorted
    assert(n == days.size && k == types.size)
    val cnt = ev.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def c(d: String, t: String) = cnt.getOrElse((d, t), 0L)
    val r2 = (for (d <- days; t <- types) yield ((d, t),
      2L * types.count(o => c(d, o) < c(d, t))
        + types.count(o => c(d, o) == c(d, t)) + 1)).toMap
    val ssj = types.map { t =>
      val dev = days.map(d => r2((d, t))).sum - n * (k + 1)
      dev.toDouble * dev
    }.sum
    val ssd = r2.values.map { v =>
      val dev = v - (k + 1); dev.toDouble * dev
    }.sum
    val wantQ = (k - 1).toDouble * ssj / ssd
    assert(math.abs(q - math.rint(wantQ * 1e6) / 1e6) < 1e-9, s"$q vs $wantQ")
    assert(math.abs(w - math.rint(wantQ / (n * (k - 1)) * 1e6) / 1e6) < 1.01e-6)
    assert(w > 0 && w <= 1, s"W=$w must be a valid concordance")
    FixtureVacuity.assertNonTrivial(df("p242_friedman_test"), "friedman_q")
  }

  test("p243: JT statistic matches the literal pair space, with its moments") {
    val r = run("p243_jonckheere_terpstra").head
    val (kg, n, jt, e, v, z) = (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5))
    val groups = docs.groupBy(_._1).view.mapValues(_.map(_._3)).toMap
    val names = groups.keys.toSeq.sorted
    assert(kg == names.size && n == docs.size)
    val wantJt = (for {
      gi <- names.indices; hi <- (gi + 1) until names.size
      x <- groups(names(gi)); y <- groups(names(hi))
    } yield if (x < y) 1.0 else if (x == y) 0.5 else 0.0).sum
    assert(math.abs(jt - wantJt) < 1e-6, s"$jt vs $wantJt")
    val ngs = names.map(groups(_).size.toLong)
    val wantE = (n.toDouble * n - ngs.map(g => g.toDouble * g).sum) / 4
    assert(math.abs(e - math.rint(wantE * 1e6) / 1e6) < 1e-9)
    // tie-corrected variance (Hollander-Wolfe three-term form)
    val ties = docs.map(_._3).groupBy(identity).values.map(_.size.toLong)
    def s1(cs: Iterable[Long]) = cs.map(x => x.toDouble * (x - 1) * (2 * x + 5)).sum
    def s2(cs: Iterable[Long]) = cs.map(x => x.toDouble * (x - 1) * (x - 2)).sum
    def s3(cs: Iterable[Long]) = cs.map(x => x.toDouble * (x - 1)).sum
    val nd = n.toDouble
    val wantV = (nd * (nd - 1) * (2 * nd + 5) - s1(ngs) - s1(ties)) / 72 +
      s2(ngs) * s2(ties) / (36 * nd * (nd - 1) * (nd - 2)) +
      s3(ngs) * s3(ties) / (8 * nd * (nd - 1))
    assert(math.abs(v - wantV) < math.abs(wantV) * 1e-9 + 1e-6, s"$v vs $wantV")
    assert(math.abs(z - math.rint((jt - e) / math.sqrt(v) * 1e6) / 1e6) < 2e-6)
    FixtureVacuity.assertNonTrivial(df("p243_jonckheere_terpstra"), "z")
  }

  test("p244: A2akN matches a direct Scholz-Stephens recompute per language") {
    val rows = run("p244_ad_ksample").map(r => (r.getString(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getLong(4)))
    val langs = rows.map(_._1)
    assert(langs.length >= 2)
    val byLang = docs.groupBy(_._2).view.mapValues(_.map(_._3)).toMap
    val nTot = docs.size.toLong
    val vals = docs.map(_._3).distinct.sorted
    val poolC = docs.map(_._3).groupBy(identity).view.mapValues(_.size.toLong).toMap
    // doubled mid-cumulatives, exactly as the query forms them
    var b = 0L
    val b2 = vals.map { v => val l = poolC(v); b += l; (v, l, 2 * b - l) }
    val comps = langs.map { lang =>
      val xs = byLang(lang)
      val ni = xs.size.toLong
      val cnt = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      var mc = 0L
      val terms = b2.collect { case (v, l, bb2) if l < nTot =>
        val m = cnt.getOrElse(v, 0L); mc += m
        val m2 = 2 * mc - m
        val d = nTot.toDouble * m2 - ni.toDouble * bb2
        val t = l.toDouble * d * d /
          (nTot.toDouble * (bb2.toDouble * (2.0 * nTot - bb2) - nTot.toDouble * l))
        math.rint(t * 1e12) / 1e12
      }
      math.rint(terms.sum / ni * 1e9) / 1e9
    }
    val wantA2 = (nTot - 1).toDouble / nTot * comps.sum
    rows.zip(comps).foreach { case ((lang, ni, comp, a2, mean), wantC) =>
      assert(ni == byLang(lang).size, lang)
      assert(math.abs(comp - math.rint(wantC * 1e6) / 1e6) < 1e-9, lang)
      assert(math.abs(a2 - math.rint(wantA2 * 1e6) / 1e6) < 1e-9)
      assert(mean == langs.length - 1)
    }
    FixtureVacuity.assertDiscriminates(df("p244_ad_ksample"), "ad_component", 2)
  }

  test("p245: Gumbel moment identities and ordered return levels") {
    val r = run("p245_gumbel_maxima").head
    val (n, mean, mu, beta, rl30, rl365) = (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    val mx = Tables.df(spark, SharedSpark.sf, "events")
      .selectExpr("cast(ts as date) as d", "value")
      .groupBy("d").agg(org.apache.spark.sql.functions.expr("max(value)"))
      .collect().map(x => math.rint(x.getDouble(1) * 1e6) / 1e6)
    assert(n == mx.length)
    val m = mx.sum / n
    val sd = math.sqrt((mx.map(x => x * x).sum / n - m * m) * n / (n - 1))
    assert(math.abs(mean - math.rint(m * 1e6) / 1e6) < 1e-5)
    val wantBeta = sd * math.sqrt(6.0) / math.Pi
    assert(math.abs(beta - wantBeta) < 1e-5, s"$beta vs $wantBeta")
    val wantMu = m - 0.5772156649015329 * wantBeta
    assert(math.abs(mu - wantMu) < 1e-5)
    // longer horizon -> strictly higher return level, both above the mode
    assert(rl365 > rl30 && rl30 > mu)
    FixtureVacuity.assertNonTrivial(df("p245_gumbel_maxima"), "gumbel_beta")
  }

  test("p246: Pettitt U equals the two-sided split sum; K and p check out") {
    val r = run("p246_pettitt_changepoint").head
    val (cpDate, t, k, p) = (r.getDate(0).toString, r.getLong(1),
      r.getLong(2), r.getDouble(3))
    val cs = dailyCounts
    assert(t == cs.size)
    def sgn(a: Long, b: Long) = java.lang.Long.signum(a - b).toLong
    val us = cs.indices.dropRight(1).map { ti =>
      (cs(ti)._1, (for (i <- 0 to ti; j <- (ti + 1) until cs.size)
        yield sgn(cs(i)._2, cs(j)._2)).sum)
    }
    val kWant = us.map(u => math.abs(u._2)).max
    assert(k == kWant, s"$k vs $kWant")
    assert(cpDate == us.filter(u => math.abs(u._2) == kWant).map(_._1).min)
    val td = t.toDouble
    val pWant = math.min(1.0, 2 * math.exp(-(6.0 * k * k) / (td * td * td + td * td)))
    assert(math.abs(p - math.rint(pWant * 1e6) / 1e6) < 1e-9)
    assert(p > 0 && p <= 1)
    FixtureVacuity.assertNonTrivial(df("p246_pettitt_changepoint"), "k_stat")
  }
}
