package graft

import org.scalatest.funsuite.AnyFunSuite

/** Properties of the batch-55 operators beyond the driver gate: plain-Scala
  * recomputations from the raw sf0.001 tables, the H/F statistics' exact
  * pair identities, Cliff's delta pair-count conservation, Yule's K
  * scale-invariance shape, log-odds antisymmetry, and Cochran's Q column
  * identity — plus the FixtureVacuity probes the r16 verdict asked to make
  * standard for every new batch.
  */
class PipelineBatch55Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get
  private def df(n: String) = byName(n).run(spark, SharedSpark.sf)
  private def run(n: String) = df(n).collect()

  private lazy val docs: Seq[(String, String, String, Long)] =
    Tables.df(spark, SharedSpark.sf, "documents")
      .select("text", "source", "lang", "n_chars").collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("p223: Kruskal-Wallis H matches a plain-Scala midrank recompute") {
    val r = run("p223_kruskal_wallis").head
    val (k, n, h) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(k == docs.map(_._2).distinct.size && n == docs.size)
    // rank all lengths with midranks, sum per source
    val all = docs.map(_._4).sorted
    val rank: Map[Long, Double] = all.distinct.map { v =>
      val below = all.count(_ < v); val c = all.count(_ == v)
      v -> (below + (c + 1) / 2.0)
    }.toMap
    val bySrc = docs.groupBy(_._2)
    val sR2n = bySrc.values.map { g =>
      val rs = g.map(d => rank(d._4)).sum
      math.rint(rs * rs / g.size * 1e6) / 1e6
    }.sum
    val mine = 12.0 * (sR2n / (n * (n + 1.0))) - 3.0 * (n + 1.0)
    assert(math.abs(h - math.rint(mine * 1e6) / 1e6) < 1e-5, s"$h vs $mine")
    // tie-corrected H is >= H (the correction divides by 1 - T <= 1)
    assert(r.getDouble(3) >= h - 1e-9)
    FixtureVacuity.assertNonTrivial(df("p223_kruskal_wallis"), "h")
  }

  test("p224: Brown-Forsythe F matches an ANOVA on |x - group median|") {
    val r = run("p224_brown_forsythe").head
    val (k, n, ssb, ssw, f) = (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val bySrc = docs.groupBy(_._2).view.mapValues(_.map(_._4.toDouble)).toMap
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val z = bySrc.view.mapValues(xs => { val m = median(xs); xs.map(x => math.abs(x - m)) }).toMap
    val zAll = z.values.flatten.toSeq
    val zbar = zAll.sum / zAll.size
    val myssb = z.values.map { g =>
      val gm = g.sum / g.size
      math.rint(g.size * (gm - zbar) * (gm - zbar) * 1e6) / 1e6
    }.sum
    val myssw = z.values.map { g =>
      val gm = g.sum / g.size
      math.rint(g.map(x => (x - gm) * (x - gm)).sum * 1e6) / 1e6
    }.sum
    assert(math.abs(ssb - math.rint(myssb * 1e6) / 1e6) < 1e-4, s"$ssb vs $myssb")
    assert(math.abs(ssw - math.rint(myssw * 1e6) / 1e6) < 1e-4, s"$ssw vs $myssw")
    val myf = (myssb / (k - 1)) / (myssw / (n - k))
    assert(math.abs(f - myf) < 1e-4)
    assert(ssb > 0 && ssw > 0, "both variance components must be exercised")
  }

  test("p225: Cliff's delta pair counts conserve n_en * n_ot exactly") {
    val r = run("p225_cliffs_delta").head
    val (nEn, nOt, gt, lt, tied, delta) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
    assert(nEn == docs.count(_._3 == "en") && nOt == docs.count(_._3 != "en"))
    assert(gt + lt + tied == nEn * nOt, "every (en, other) pair counted once")
    // brute-force recount on the tiny fixture
    val en = docs.filter(_._3 == "en").map(_._4)
    val ot = docs.filter(_._3 != "en").map(_._4)
    val myGt = en.map(x => ot.count(_ < x).toLong).sum
    val myTied = en.map(x => ot.count(_ == x).toLong).sum
    assert(gt == myGt && tied == myTied)
    assert(math.abs(delta - math.rint((myGt - (nEn * nOt - myGt - myTied)).toDouble
      / (nEn.toDouble * nOt) * 1e6) / 1e6) < 1e-9)
    assert(delta > -1 && delta < 1)
  }

  test("p226: bigram spectrum identities hold and the fixture is hapax-rich") {
    val rows = run("p226_bigram_richness").map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.length == docs.map(_._2).distinct.size)
    rows.foreach { case (src, nTok, nTyp, hapax, share, k) =>
      assert(nTyp <= nTok && hapax <= nTyp, src)
      assert(math.abs(share - math.rint(hapax.toDouble / nTyp * 1e6) / 1e6) < 1e-9)
      assert(k > 0, s"$src: Yule's K must be positive on a repetitive corpus")
    }
    // the p211 lesson, now asserted: bigrams keep the singleton head alive
    assert(rows.forall(_._4 > 0), "every source must have bigram hapaxes")
    FixtureVacuity.assertDiscriminates(df("p226_bigram_richness"), "yule_k", 5)
    // recompute one source brutally
    val src = rows.head._1
    val bgs = docs.filter(_._2 == src).flatMap { d =>
      val t = d._1.toLowerCase.split("\\s+").filter(_.nonEmpty)
      t.sliding(2).filter(_.length == 2).map(_.mkString(" "))
    }
    val freq = bgs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nTok = freq.values.sum
    val myK = 10000.0 * (freq.values.map(c => c * c).sum.toDouble - nTok) /
      (nTok.toDouble * nTok)
    assert(math.abs(rows.head._6 - math.rint(myK * 1e6) / 1e6) < 1e-5)
    assert(rows.head._2 == nTok && rows.head._3 == freq.size &&
      rows.head._4 == freq.values.count(_ == 1L))
  }

  test("p227: log-odds with Dirichlet prior is antisymmetric and z-consistent") {
    val rows = run("p227_logodds_dirichlet").map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val nEn = rows.map(_._2).sum; val nOt = rows.map(_._3).sum
    // recompute one token end to end
    val (w, cEn, cOt, lo, zs) = rows.maxBy(r => math.abs(r._5))
    val aw = 1000.0 * (cEn + cOt) / (nEn + nOt)
    val myLo = math.log((cEn + aw) / (nEn + 1000.0 - cEn - aw)) -
      math.log((cOt + aw) / (nOt + 1000.0 - cOt - aw))
    val myZ = myLo / math.sqrt(1.0 / (cEn + aw) + 1.0 / (cOt + aw))
    assert(math.abs(lo - math.rint(myLo * 1e6) / 1e6) < 1e-6, w)
    assert(math.abs(zs - math.rint(myZ * 1e6) / 1e6) < 1e-6, w)
    // z and log-odds agree in sign; some token must actually discriminate
    rows.foreach(r => assert(r._4 * r._5 >= 0, r._1))
    FixtureVacuity.assertDiscriminates(df("p227_logodds_dirichlet"), "z_score", 10)
    assert(rows.exists(_._5 > 0) && rows.exists(_._5 < 0),
      "the en/other contrast must cut both ways across the vocabulary")
  }

  test("p228: Cochran's Q matches the closed form and the screens disagree") {
    val r = run("p228_cochran_q").head
    val (n, c1, c2, c3, q) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4))
    assert(n == docs.size)
    val lens = docs.map(_._4.toDouble).sorted
    val med = if (lens.size % 2 == 1) lens(lens.size / 2)
      else (lens(lens.size / 2 - 1) + lens(lens.size / 2)) / 2.0
    val marks = docs.map { d =>
      val nt = d._1.toLowerCase.split("\\s+").count(_.nonEmpty)
      (if (d._4 > med) 1L else 0L,
        if (nt > 60) 1L else 0L,
        if (2 * d._4 > 11L * nt) 1L else 0L)
    }
    assert(c1 == marks.map(_._1).sum && c2 == marks.map(_._2).sum &&
      c3 == marks.map(_._3).sum)
    val sr = marks.map(m => m._1 + m._2 + m._3).sum
    val srr = marks.map(m => { val s = m._1 + m._2 + m._3; s * s }).sum
    val myQ = 2.0 * (3 * (c1 * c1 + c2 * c2 + c3 * c3) -
      (c1 + c2 + c3) * (c1 + c2 + c3)) / (3 * sr - srr)
    assert(math.abs(q - math.rint(myQ * 1e6) / 1e6) < 1e-9)
    // vacuity: the three screens must not be identical columns
    assert(Set(c1, c2, c3).size >= 2, "screens must disagree somewhere")
    FixtureVacuity.assertNonTrivial(df("p228_cochran_q"), "cochran_q")
  }
}
