package graft

import org.scalatest.funsuite.AnyFunSuite

/** Properties of the batch-61 operators beyond the driver gate: Ljung–Box Q
  * against a direct ACF recompute, D'Agostino K² against the closed-form
  * transformation chain on raw values, Breusch–Pagan and Chow against
  * hand-fit OLS sums, Wilcoxon signed-rank against a sort-and-rank
  * recompute, and the Kneser–Ney discounts against a bigram count map —
  * with FixtureVacuity probes throughout.
  */
class PipelineBatch61Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get
  private def df(n: String) = byName(n).run(spark, SharedSpark.sf)
  private def run(n: String) = df(n).collect()

  private lazy val dailyCounts: Seq[(java.time.LocalDate, Long)] =
    Tables.df(spark, SharedSpark.sf, "events")
      .selectExpr("cast(ts as date) as d").groupBy("d").count()
      .collect().toSeq.map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .sortBy(_._1.toEpochDay)

  private def r9(x: Double) = math.rint(x * 1e9) / 1e9
  private def r6(x: Double) = math.rint(x * 1e6) / 1e6

  test("p259: Q matches the direct Ljung-Box recompute") {
    val r = run("p259_ljung_box").head
    val (n, k, q) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    val ys = dailyCounts.map(_._2.toDouble)
    assert(n == ys.size && k == 7)
    val mu = ys.sum / n
    val den = ys.map(y => r9((y - mu) * (y - mu))).sum
    val s = (1 to 7).map { lag =>
      val num = ys.drop(lag).zip(ys.dropRight(lag))
        .map { case (a, b) => r9((a - mu) * (b - mu)) }.sum
      val rk = num / den
      r9(rk * rk / (n - lag))
    }.sum
    val want = n.toDouble * (n + 2) * s
    assert(math.abs(q - r6(want)) < 1e-6, s"$q vs $want")
    FixtureVacuity.assertNonTrivial(df("p259_ljung_box"), "q_lb")
  }

  test("p260: K2 matches the closed-form chain on raw n_chars") {
    val r = run("p260_dagostino_k2").head
    val (n, z1, z2, k2) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val xs = Tables.df(spark, SharedSpark.sf, "documents")
      .select("n_chars").collect().map(_.getLong(0))
    assert(n == xs.length)
    val nn = n.toDouble
    val m1 = xs.map(BigInt(_)).sum.toDouble / nn
    val r2 = xs.map(x => BigInt(x) * BigInt(x)).sum.toDouble / nn
    val r3 = xs.map(x => BigInt(x) * BigInt(x) * BigInt(x)).sum.toDouble / nn
    val r4 = xs.map(x => BigInt(x) * BigInt(x) * BigInt(x) * BigInt(x)).sum.toDouble / nn
    val m2 = r2 - m1 * m1
    val m3 = r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1
    val m4 = r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2 - 3.0 * m1 * m1 * m1 * m1
    val g1 = m3 / math.sqrt(m2 * m2 * m2)
    val b2 = m4 / (m2 * m2)
    val y = g1 * math.sqrt((nn + 1) * (nn + 3) / (6.0 * (nn - 2)))
    val beta2 = 3.0 * (nn * nn + 27 * nn - 70) * (nn + 1) * (nn + 3) /
      ((nn - 2) * (nn + 5) * (nn + 7) * (nn + 9))
    val w2 = math.sqrt(2.0 * (beta2 - 1)) - 1
    val ya = y / math.sqrt(2.0 / (w2 - 1))
    val wz1 = (1 / math.sqrt(math.log(math.sqrt(w2)))) *
      math.log(ya + math.sqrt(ya * ya + 1))
    val xk = (b2 - 3.0 * (nn - 1) / (nn + 1)) /
      math.sqrt(24.0 * nn * (nn - 2) * (nn - 3) /
        ((nn + 1) * (nn + 1) * (nn + 3) * (nn + 5)))
    val sb1 = 6.0 * (nn * nn - 5 * nn + 2) / ((nn + 7) * (nn + 9)) *
      math.sqrt(6.0 * (nn + 3) * (nn + 5) / (nn * (nn - 2) * (nn - 3)))
    val aa = 6 + 8 / sb1 * (2 / sb1 + math.sqrt(1 + 4 / (sb1 * sb1)))
    val wz2 = ((1 - 2.0 / (9 * aa)) -
      math.cbrt((1 - 2.0 / aa) / (1 + xk * math.sqrt(2.0 / (aa - 4))))) /
      math.sqrt(2.0 / (9 * aa))
    assert(math.abs(z1 - r6(wz1)) < 2e-6, s"$z1 vs $wz1")
    assert(math.abs(z2 - r6(wz2)) < 2e-6, s"$z2 vs $wz2")
    assert(math.abs(k2 - r6(wz1 * wz1 + wz2 * wz2)) < 4e-6)
    // K² is a positive omnibus statistic; exactly 0 would mean the fixture
    // is a perfect normal sample — vacuous
    FixtureVacuity.assertNonTrivial(df("p260_dagostino_k2"), "k2_stat")
  }

  /** OLS slope/intercept of daily counts on the day index, from exact sums. */
  private def olsFit(pts: Seq[(Long, Long)]): (Double, Double) = {
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum.toDouble
    val sy = pts.map(_._2).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    (b, (sy - b * sx) / n)
  }

  test("p261: LM matches the auxiliary-regression recompute") {
    val r = run("p261_breusch_pagan").head
    val (n, lm, slope) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    val d0 = dailyCounts.head._1.toEpochDay
    val pts = dailyCounts.map { case (d, c) => (d.toEpochDay - d0, c) }
    assert(n == pts.size)
    val (b, a) = olsFit(pts)
    val us = pts.map { case (x, yv) =>
      (x, r9((yv - a - b * x) * (yv - a - b * x)))
    }
    val nn = n.toDouble
    val sx = us.map(_._1).sum.toDouble
    val sxx = us.map(u => u._1 * u._1).sum.toDouble
    val su = us.map(_._2).sum
    val sxu = us.map(u => r9(u._2 * u._1)).sum
    val suu = us.map(u => r9(u._2 * u._2)).sum
    val cxu = sxu - sx * su / nn
    val cxx = sxx - sx * sx / nn
    val cuu = suu - su * su / nn
    assert(math.abs(lm - r6(nn * cxu * cxu / (cxx * cuu))) < 1e-5, s"lm $lm")
    assert(math.abs(slope - r6(cxu / cxx)) < 1e-5)
    FixtureVacuity.assertNonTrivial(df("p261_breusch_pagan"), "bp_lm")
  }

  test("p262: F matches the pooled-vs-split RSS recompute") {
    val r = run("p262_chow_break").head
    val (n, brk, f) = (r.getLong(0), r.getDate(1).toLocalDate, r.getDouble(2))
    val d0 = dailyCounts.head._1.toEpochDay
    val pts = dailyCounts.map { case (d, c) => (d.toEpochDay - d0, c) }
    assert(n == pts.size)
    val half = pts.size / 2
    assert(brk == dailyCounts(half)._1)
    def rss(seg: Seq[(Long, Long)]): Double = {
      val m = seg.size.toDouble
      val sx = seg.map(_._1).sum.toDouble
      val sy = seg.map(_._2).sum.toDouble
      val sxy = seg.map(p => p._1 * p._2).sum.toDouble
      val sxx = seg.map(p => p._1 * p._1).sum.toDouble
      val syy = seg.map(p => p._2 * p._2).sum.toDouble
      (syy - sy * sy / m) -
        (sxy - sx * sy / m) * (sxy - sx * sy / m) / (sxx - sx * sx / m)
    }
    val (rssP, rss1, rss2) =
      (rss(pts), rss(pts.take(half)), rss(pts.drop(half)))
    val want = ((rssP - rss1 - rss2) / 2) / ((rss1 + rss2) / (n - 4))
    assert(math.abs(f - r6(want)) < 1e-5, s"$f vs $want")
    FixtureVacuity.assertNonTrivial(df("p262_chow_break"), "chow_f")
  }

  test("p263: W+ and z match the sort-and-rank recompute") {
    val r = run("p263_wilcoxon_signed_rank").head
    val (n, wPlus, z) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    val byDay = Tables.df(spark, SharedSpark.sf, "events")
      .selectExpr("cast(ts as date) as d", "event_type").collect()
      .groupBy(_.getDate(0).toLocalDate)
    val diffs = byDay.values.map { rows =>
      rows.count(_.getString(1) == "click").toLong -
        rows.count(_.getString(1) == "view")
    }.filter(_ != 0L).toSeq
    assert(n == diffs.size)
    // midranks of |d| over the sorted absolute values
    val sorted = diffs.map(math.abs).sorted.zipWithIndex
    val rankOf = sorted.groupBy(_._1).view
      .mapValues(g => g.map(_._2 + 1).sum.toDouble / g.size).toMap
    val want = diffs.filter(_ > 0).map(d => rankOf(math.abs(d))).sum
    assert(math.abs(wPlus - want) < 1e-9, s"$wPlus vs $want")
    val nn = n.toDouble
    val ties = diffs.map(math.abs).groupBy(identity).values
      .map(g => g.size.toLong)
    val tie3 = ties.map(t => t * t * t - t).sum
    val sd = math.sqrt(nn * (nn + 1) * (2 * nn + 1) / 24 - tie3 / 48.0)
    val wantZ = (want - nn * (nn + 1) / 4) / sd
    assert(math.abs(z - r6(wantZ)) < 1e-6, s"$z vs $wantZ")
    FixtureVacuity.assertNonTrivial(df("p263_wilcoxon_signed_rank"), "z_stat")
  }

  test("p264: discounts match the bigram count-of-counts recompute") {
    val r = run("p264_kneser_ney_discounts").head
    val (types, n1, n2, n3, n4) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))
    val (d1, d2, d3p) = (r.getDouble(5), r.getDouble(6), r.getDouble(7))
    val counts = new scala.collection.mutable.HashMap[String, Long]()
    Tables.df(spark, SharedSpark.sf, "documents")
      .select("text").collect().foreach { row =>
        val t = row.getString(0).toLowerCase.split("\\s+", -1)
        t.sliding(2).withFilter(_.size == 2).map(_.mkString(" "))
          .filter(_.nonEmpty)
          .foreach(b => counts(b) = counts.getOrElse(b, 0L) + 1)
      }
    val cc = counts.values.groupBy(identity).view.mapValues(_.size.toLong)
    assert(types == counts.size)
    assert(n1 == cc.getOrElse(1L, 0L) && n2 == cc.getOrElse(2L, 0L))
    assert(n3 == cc.getOrElse(3L, 0L) && n4 == cc.getOrElse(4L, 0L))
    val y = n1.toDouble / (n1 + 2 * n2)
    assert(math.abs(d1 - r6(1 - 2 * y * n2 / n1)) < 1e-9)
    assert(math.abs(d2 - r6(2 - 3 * y * n3 / n2)) < 1e-9)
    assert(math.abs(d3p - r6(3 - 4 * y * n4 / n3)) < 1e-9)
    // the discounts must be real (n1..n4 all positive on this corpus) and
    // D1 strictly inside (0, 1.5) — the Chen-Goodman sane range
    assert(Seq(n1, n2, n3, n4).forall(_ > 0), "count-of-counts degenerate")
    FixtureVacuity.assertNonTrivial(df("p264_kneser_ney_discounts"), "d1")
  }
}
