package graft

import org.scalatest.funsuite.AnyFunSuite

/** Properties of the batch-56 operators beyond the driver gate: plain-Scala
  * recomputations from the raw sf0.001 tables, the CA/runs closed forms,
  * RBO bounds and identity behavior, Cohen/Hedges algebra, DP axioms, and
  * the Mantel–Haenszel vs crude odds-ratio relationship — with the
  * FixtureVacuity probes standard since batch 55.
  */
class PipelineBatch56Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get
  private def df(n: String) = byName(n).run(spark, SharedSpark.sf)
  private def run(n: String) = df(n).collect()

  private lazy val docs: Seq[(String, String, String, Long)] =
    Tables.df(spark, SharedSpark.sf, "documents")
      .select("text", "source", "lang", "n_chars").collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("p229: Cochran-Armitage matches the closed form on fixed buckets") {
    val r = run("p229_cochran_armitage").head
    val (n, nEn, t, varT, z) = (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(n == docs.size && nEn == docs.count(_._3 == "en"))
    val byB = docs.groupBy(d => math.min(d._4 / 140, 3L))
    val (rTot, nTot) = (nEn.toDouble, n.toDouble)
    val myT = byB.map { case (s, g) =>
      s * (g.count(_._3 == "en") - g.size * rTot / nTot)
    }.sum
    val sn = byB.map { case (s, g) => s * g.size }.sum.toDouble
    val ssn = byB.map { case (s, g) => s * s * g.size }.sum.toDouble
    val p = rTot / nTot
    val myVar = p * (1 - p) * (ssn - sn * sn / nTot)
    assert(math.abs(t - math.rint(myT * 1e6) / 1e6) < 1e-5)
    assert(math.abs(varT - math.rint(myVar * 1e6) / 1e6) < 1e-4)
    assert(math.abs(z - myT / math.sqrt(myVar)) < 1e-4)
    assert(byB.size >= 3, "the fixed buckets must actually split the corpus")
    FixtureVacuity.assertNonTrivial(df("p229_cochran_armitage"), "ca_z")
  }

  test("p230: RBO sits in (0, max] and equals 0.878 on identical rankings") {
    val r = run("p230_rbo_token_ranks").head
    val rbo = r.getDouble(1)
    // truncated RBO max at k=20, p=0.9: 0.1 * sum p^(d-1) = 1 - 0.9^20
    val max = 1.0 - math.pow(0.9, 20)
    assert(rbo > 0 && rbo <= max + 1e-9, s"$rbo vs max $max")
    assert(rbo < max - 1e-3,
      "en and non-en rankings must differ somewhere or the op is vacuous")
    // identity recompute: the same list against itself hits the max
    val self = (1 to 20).map(d => math.pow(0.9, d - 1) * d / d).sum * 0.1
    assert(math.abs(self - max) < 1e-9)
  }

  test("p231: Cohen's d matches pooled-variance algebra; Hedges shrinks it") {
    val r = run("p231_cohens_d").head
    val (n1, n2, m1, m2, d, g) = (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5))
    val en = docs.filter(_._3 == "en").map(_._4.toDouble)
    val ot = docs.filter(_._3 != "en").map(_._4.toDouble)
    assert(n1 == en.size && n2 == ot.size)
    def mv(xs: Seq[Double]) = {
      val m = xs.sum / xs.size
      (m, xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1))
    }
    val ((mm1, v1), (mm2, v2)) = (mv(en), mv(ot))
    assert(math.abs(m1 - math.rint(mm1 * 1e6) / 1e6) < 1e-4)
    val myD = (mm1 - mm2) / math.sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2.0))
    assert(math.abs(d - myD) < 1e-4, s"$d vs $myD")
    assert(math.abs(g) < math.abs(d), "Hedges' correction shrinks toward 0")
    assert(math.abs(g - d * (1.0 - 3.0 / (4 * (n1 + n2) - 9))) < 1e-4)
  }

  test("p232: runs-test counts match a sequential recompute") {
    val r = run("p232_runs_test").head
    val (n, n1, n2, runs, mu, z) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4), r.getDouble(5))
    val daily = Tables.df(spark, SharedSpark.sf, "events")
      .selectExpr("cast(ts as date) as d").groupBy("d").count()
      .collect().map(x => (x.getDate(0).toString, x.getLong(1))).sortBy(_._1)
    val cs = daily.map(_._2.toDouble).sorted
    val med = if (cs.length % 2 == 1) cs(cs.length / 2)
      else (cs(cs.length / 2 - 1) + cs(cs.length / 2)) / 2.0
    val signs = daily.map(_._2.toDouble).filter(_ != med).map(_ > med)
    assert(n == signs.size && n1 == signs.count(identity))
    val myRuns = 1 + signs.zip(signs.tail).count { case (a, b) => a != b }
    assert(runs == myRuns)
    val myMu = 2.0 * n1 * n2 / n + 1
    assert(math.abs(mu - myMu) < 1e-6)
    val myVar = (2.0 * n1 * n2 * (2.0 * n1 * n2 - n)) / (n.toDouble * n * (n - 1))
    assert(math.abs(z - math.rint((runs - myMu) / math.sqrt(myVar) * 1e6) / 1e6) < 1e-6)
  }

  test("p233: Gries DP is in [0,1), 0.5-scaled, and discriminates tokens") {
    val rows = run("p233_gries_dp").map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (w, f, dp) =>
      assert(dp >= 0 && dp < 1, s"$w: $dp")
      assert(f > 0)
    }
    FixtureVacuity.assertDiscriminates(df("p233_gries_dp"), "gries_dp", 10)
    // recompute one token end to end
    val toks = docs.flatMap(d => d._1.toLowerCase.split("\\s+")
      .filter(_.nonEmpty).map(w => (w, d._2)))
    val srcTot = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nAll = toks.size.toDouble
    val (w0, f0, dp0) = rows.head
    val mine = toks.filter(_._1 == w0).groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val fw = mine.values.sum.toDouble
    assert(f0 == fw.toLong)
    val myDp = 0.5 * srcTot.keys.map { s =>
      math.rint(math.abs(mine.getOrElse(s, 0L) / fw - srcTot(s) / nAll) * 1e9) / 1e9
    }.sum
    assert(math.abs(dp0 - math.rint(myDp * 1e6) / 1e6) < 1e-5, s"$w0: $dp0 vs $myDp")
  }

  test("p234: MH odds ratio matches the stratified closed form") {
    val r = run("p234_mantel_haenszel").head
    val (k, a, b, c, d, crude, mh) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))
    val marks = docs.map { doc =>
      val nt = doc._1.toLowerCase.split("\\s+").length
      (doc._3, doc._4 > 300, 2 * doc._4 > 11L * nt)
    }
    assert(k == marks.map(_._1).distinct.size)
    assert(a == marks.count(m => m._2 && m._3) && d == marks.count(m => !m._2 && !m._3))
    assert(math.abs(crude - math.rint(a.toDouble * d / (b.toDouble * c) * 1e6) / 1e6) < 1e-9)
    val byL = marks.groupBy(_._1)
    val sAd = byL.values.map { g =>
      val (aa, dd) = (g.count(m => m._2 && m._3), g.count(m => !m._2 && !m._3))
      math.rint(aa.toDouble * dd / g.size * 1e9) / 1e9
    }.sum
    val sBc = byL.values.map { g =>
      val (bb, cc) = (g.count(m => m._2 && !m._3), g.count(m => !m._2 && m._3))
      math.rint(bb.toDouble * cc / g.size * 1e9) / 1e9
    }.sum
    assert(math.abs(mh - math.rint(sAd / sBc * 1e6) / 1e6) < 1e-5)
    assert(crude > 0 && mh > 0)
  }
}
