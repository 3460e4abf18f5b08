package graft

import org.scalatest.funsuite.AnyFunSuite

/** Properties of the batch-62 operators beyond the driver gate: Fisher's g
  * against a direct periodogram recompute, turning points against a scan of
  * the daily series, Mood's χ² against a hand-built 2×k table, the ordinal
  * association family against an O(n²) raw-pair count, the Brier
  * decomposition against per-document scores (including the Murphy identity
  * residual), and ICC(1) against a two-way loop recompute — with
  * FixtureVacuity probes throughout.
  */
class PipelineBatch62Spec extends AnyFunSuite {
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

  test("p265: g matches the direct periodogram recompute") {
    val r = run("p265_fisher_g").head
    val (n, jStar, period, g) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    val ys = dailyCounts.map(_._2.toDouble)
    assert(n == ys.size)
    val spec = (1 to ((ys.size - 1) / 2)).map { j =>
      val a = ys.zipWithIndex
        .map { case (y, t) => r9(y * math.cos(6.283185307179586 * j * t / n)) }
        .sum
      val b = ys.zipWithIndex
        .map { case (y, t) => r9(y * math.sin(6.283185307179586 * j * t / n)) }
        .sum
      (j, (a * a + b * b) / n)
    }
    val imax = spec.map(_._2).max
    val wantJ = spec.filter(_._2 == imax).map(_._1).min
    val tot = spec.map(p => r9(p._2)).sum
    assert(jStar == wantJ, s"$jStar vs $wantJ")
    assert(math.abs(period - r6(n.toDouble / wantJ)) < 1e-9)
    assert(math.abs(g - r6(imax / tot)) < 1e-6, s"$g vs ${imax / tot}")
    // g must exceed the flat-spectrum value 1/#freqs — otherwise the
    // fixture has no dominant cycle and the op discriminates nothing
    assert(g > 1.0 / spec.size, "fixture-vacuity: flat spectrum")
    FixtureVacuity.assertNonTrivial(df("p265_fisher_g"), "fisher_g")
  }

  test("p266: T and z match the series scan") {
    val r = run("p266_turning_points").head
    val (n, t, z) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    val ys = dailyCounts.map(_._2)
    assert(n == ys.size)
    val want = ys.sliding(3).count(w =>
      w.size == 3 && ((w(1) > w(0) && w(1) > w(2)) || (w(1) < w(0) && w(1) < w(2))))
    assert(t == want, s"$t vs $want")
    val wantZ = (t - 2.0 * (n - 2) / 3) / math.sqrt((16.0 * n - 29) / 90)
    assert(math.abs(z - r6(wantZ)) < 1e-9)
    FixtureVacuity.assertNonTrivial(df("p266_turning_points"), "n_turning")
  }

  test("p267: chi2 matches the hand-built 2xk median table") {
    val r = run("p267_mood_median").head
    val (n, med, dfree, chi2) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    val rows = Tables.df(spark, SharedSpark.sf, "documents")
      .select("source", "n_chars").collect()
      .map(x => (x.getString(0), x.getLong(1)))
    assert(n == rows.length)
    val sorted = rows.map(_._2).sorted
    val wantMed = sorted((rows.length - 1) / 2) // smallest v with 2F >= N
    assert(med == wantMed, s"$med vs $wantMed")
    val bySrc = rows.groupBy(_._1)
    assert(dfree == bySrc.size - 1)
    val at = rows.count(_._2 > med).toDouble
    val nt = rows.length.toDouble
    val want = bySrc.values.map { g =>
      val ns = g.size.toDouble
      val a = g.count(_._2 > med).toDouble
      val ea = ns * at / nt
      val eb = ns * (nt - at) / nt
      r9((a - ea) * (a - ea) / ea + ((ns - a) - eb) * ((ns - a) - eb) / eb)
    }.sum
    assert(math.abs(chi2 - r6(want)) < 1e-6, s"$chi2 vs $want")
    FixtureVacuity.assertNonTrivial(df("p267_mood_median"), "chi2_mood")
  }

  test("p268: C/D and the three coefficients match the raw-pair count") {
    val r = run("p268_ordinal_association").head
    val (n, c, d) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (gamma, taub, somers) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
    val stops = Set("the", "a", "and", "of", "to", "in", "is")
    val pts = Tables.df(spark, SharedSpark.sf, "documents")
      .select("n_chars", "text").collect().map { row =>
        val xb = math.min(row.getLong(0) / 200, 7L)
        val yb = math.min(row.getString(1).toLowerCase.split("\\s+", -1)
          .count(stops), 4L)
        (xb, yb)
      }
    assert(n == pts.length)
    var cc = 0L; var dd = 0L
    for (i <- pts.indices; j <- (i + 1) until pts.length) {
      val (x1, y1) = pts(i); val (x2, y2) = pts(j)
      val s = (x2 - x1).sign * (y2 - y1).sign
      if (s > 0) cc += 1 else if (s < 0) dd += 1
    }
    assert(c == cc && d == dd, s"($c,$d) vs ($cc,$dd)")
    val n0 = n.toDouble * (n - 1) / 2
    val n1 = pts.groupBy(_._1).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    val n2 = pts.groupBy(_._2).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    assert(math.abs(gamma - r6((cc - dd).toDouble / (cc + dd))) < 1e-9)
    assert(math.abs(taub - r6((cc - dd) / math.sqrt((n0 - n1) * (n0 - n2)))) < 1e-6)
    assert(math.abs(somers - r6((cc - dd) / (n0 - n1))) < 1e-6)
    FixtureVacuity.assertNonTrivial(df("p268_ordinal_association"), "tau_b")
  }

  test("p269: decomposition matches per-document scores and Murphy identity") {
    val r = run("p269_brier_decomposition").head
    val (n, brier, rel, res, unc, resid) = (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    val en = Set("the", "a", "and", "of", "to", "in", "is")
    val de = Set("der", "die", "das", "und", "ist", "ein")
    val es = Set("el", "la", "de", "y", "es", "un")
    val fr = Set("le", "la", "et", "est", "un", "une")
    val scored = Tables.df(spark, SharedSpark.sf, "documents")
      .select("lang", "text").collect().map { row =>
        val t = row.getString(1).toLowerCase.split("\\s+", -1)
        val sEn = t.count(en); val tot = sEn + t.count(de) + t.count(es) + t.count(fr)
        (if (row.getString(0) == "en") 1 else 0, sEn.toDouble / (tot + 1))
      }
    assert(n == scored.length)
    val nn = n.toDouble
    val wantBrier = scored.map { case (p, rr) => r9((rr - p) * (rr - p)) }.sum / nn
    assert(math.abs(brier - r6(wantBrier)) < 1e-6)
    val ybar = scored.map(_._1).sum / nn
    val byBin = scored.groupBy { case (_, rr) => math.min((rr * 20.0).floor, 19.0) }
    val wantRel = byBin.values.map { g =>
      val conf = g.map(p => r9(p._2)).sum / g.size
      val acc = g.map(_._1).sum.toDouble / g.size
      r9(g.size * (conf - acc) * (conf - acc))
    }.sum / nn
    val wantRes = byBin.values.map { g =>
      val acc = g.map(_._1).sum.toDouble / g.size
      r9(g.size * (acc - ybar) * (acc - ybar))
    }.sum / nn
    assert(math.abs(rel - r6(wantRel)) < 1e-6, s"$rel vs $wantRel")
    assert(math.abs(res - r6(wantRes)) < 1e-6, s"$res vs $wantRes")
    assert(math.abs(unc - r6(ybar * (1 - ybar))) < 1e-6)
    // Murphy identity: brier = rel - res + unc up to the within-bin
    // variance the binning hides; the op reports that residual explicitly
    assert(math.abs(resid - r6(wantBrier - (wantRel - wantRes + ybar * (1 - ybar)))) < 2e-6)
    FixtureVacuity.assertNonTrivial(df("p269_brier_decomposition"), "resolution")
  }

  test("p270: ICC(1) matches the two-way loop recompute") {
    val r = run("p270_icc_oneway").head
    val (n, k, msb, msw, icc) = (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4))
    val raw = Tables.df(spark, SharedSpark.sf, "events")
      .selectExpr("cast(ts as date) as d", "event_type").collect()
      .groupBy(x => (x.getDate(0).toLocalDate, x.getString(1)))
      .view.mapValues(_.size.toLong).toMap
    val days = raw.keys.map(_._1).toSeq.distinct.sorted(
      Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
    val types = raw.keys.map(_._2).toSeq.distinct.sorted
    assert(n == days.size && k == types.size)
    val grid = days.map(d => types.map(t => raw.getOrElse((d, t), 0L)))
    val grand = grid.flatten.sum.toDouble / (n * k)
    val ssbOverK = grid.map { row =>
      val m = row.sum.toDouble / k
      r9((m - grand) * (m - grand))
    }.sum
    val ssw = grid.map { row =>
      val rs = row.sum.toDouble
      r9(row.map(c => c.toDouble * c).sum - rs * rs / k)
    }.sum
    val wantMsb = k * ssbOverK / (n - 1)
    val wantMsw = ssw / (n.toDouble * (k - 1))
    assert(math.abs(msb - r6(wantMsb)) < 1e-5, s"$msb vs $wantMsb")
    assert(math.abs(msw - r6(wantMsw)) < 1e-5, s"$msw vs $wantMsw")
    assert(math.abs(icc - r6((wantMsb - wantMsw) / (wantMsb + (k - 1) * wantMsw))) < 1e-6)
    FixtureVacuity.assertNonTrivial(df("p270_icc_oneway"), "icc1")
  }
}
