package graft

import org.scalatest.funsuite.AnyFunSuite

/** Properties of the batch-60 operators beyond the driver gate: Page–Hinkley
  * excursions from a sequential recompute, Yuen's statistic against a
  * sort-and-trim recompute, Bowker's χ² from a literal confusion matrix,
  * Hurst from hand-built segments, seasonal strength from a hand
  * decomposition, and the entropy rate from literal transition walks —
  * with FixtureVacuity probes throughout.
  */
class PipelineBatch60Spec extends AnyFunSuite {
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

  test("p253: excursion equals the sequential Page-Hinkley recompute") {
    val r = run("p253_page_hinkley").head
    val (n, peak, exc, excSd) = (r.getLong(0), r.getDate(1).toLocalDate,
      r.getDouble(2), r.getDouble(3))
    val ys = dailyCounts.map(_._2)
    assert(n == ys.size)
    var cum = 0L; var m = 0.0; var mMin = 0.0
    var best = 0.0; var bestAt = dailyCounts.head._1
    dailyCounts.zipWithIndex.foreach { case ((d, y), i) =>
      cum += y
      m += r9(y - cum.toDouble / (i + 1))
      mMin = math.min(mMin, m)
      if (m - mMin > best) { best = m - mMin; bestAt = d }
    }
    assert(math.abs(exc - math.rint(best * 1e6) / 1e6) < 1e-9, s"$exc vs $best")
    assert(peak == bestAt)
    val mean = ys.sum.toDouble / n
    val sd = math.sqrt(ys.map(y => y.toDouble * y).sum / n - mean * mean)
    assert(math.abs(excSd - math.rint(best / sd * 1e6) / 1e6) < 1e-9)
    FixtureVacuity.assertNonTrivial(df("p253_page_hinkley"), "ph_excursion")
  }

  test("p254: Yuen t matches a sort-and-trim recompute") {
    val r = run("p254_yuen_trimmed_ttest").head
    val (m1, m2, t, dfWs) = (r.getDouble(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3))
    val byGrp = Tables.df(spark, SharedSpark.sf, "documents")
      .selectExpr("case when lang = 'en' then 'en' else 'other' end as g",
        "n_chars").collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(1)).sorted.toIndexedSeq).toMap
    def yuen(xs: IndexedSeq[Long]): (Double, Double, Long, Long) = {
      val n = xs.size; val g = (n * 0.2).toInt; val h = n - 2 * g
      val mid = xs.slice(g, n - g)
      val tmean = mid.sum.toDouble / h
      val lo = xs(g); val hi = xs(n - g - 1) // x_(g+1), x_(n-g) 1-indexed
      val wins = IndexedSeq.fill(g)(lo) ++ mid ++ IndexedSeq.fill(g)(hi)
      val wmean = wins.sum.toDouble / n
      val wvar = wins.map(x => (x - wmean) * (x - wmean)).sum / (n - 1)
      (tmean, wvar, n, h)
    }
    val (tm1, wv1, n1, h1) = yuen(byGrp("en"))
    val (tm2, wv2, n2, h2) = yuen(byGrp("other"))
    assert(math.abs(m1 - math.rint(tm1 * 1e6) / 1e6) < 1e-9, s"$m1 vs $tm1")
    assert(math.abs(m2 - math.rint(tm2 * 1e6) / 1e6) < 1e-9)
    val d1 = (n1 - 1).toDouble * wv1 / (h1.toDouble * (h1 - 1))
    val d2 = (n2 - 1).toDouble * wv2 / (h2.toDouble * (h2 - 1))
    val wantT = (tm1 - tm2) / math.sqrt(d1 + d2)
    assert(math.abs(t - math.rint(wantT * 1e6) / 1e6) < 1e-5, s"$t vs $wantT")
    val c = d1 / (d1 + d2)
    val wantDf = 1 / (c * c / (h1 - 1) + (1 - c) * (1 - c) / (h2 - 1))
    assert(math.abs(dfWs - math.rint(wantDf * 1e6) / 1e6) < 1e-4)
    FixtureVacuity.assertNonTrivial(df("p254_yuen_trimmed_ttest"), "yuen_t")
  }

  test("p255: Bowker chi2 matches the literal confusion matrix") {
    val r = run("p255_bowker_symmetry").head
    val (dfp, nOff, chi2) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    val stop = Map(
      "en" -> Set("the", "a", "and", "of", "to", "in", "is"),
      "de" -> Set("der", "die", "das", "und", "ist", "ein"),
      "es" -> Set("el", "la", "de", "y", "es", "un"),
      "fr" -> Set("le", "la", "et", "est", "un", "une"))
    val conf = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    Tables.df(spark, SharedSpark.sf, "documents")
      .select("lang", "text").collect()
      .filter(r => Set("en", "de", "es", "fr")(r.getString(0)))
      .foreach { row =>
        val t = row.getString(1).toLowerCase.split("\\s+").toSeq
        val se = t.count(stop("en")); val sd = t.count(stop("de"))
        val ss = t.count(stop("es")); val sf = t.count(stop("fr"))
        val pred =
          if (sd > se && sd >= ss && sd >= sf) "de"
          else if (ss > se && ss > sd && ss >= sf) "es"
          else if (sf > se && sf > sd && sf > ss) "fr"
          else "en"
        conf((row.getString(0), pred)) += 1
      }
    val langs = Seq("de", "en", "es", "fr")
    val pairs = for (i <- langs.indices; j <- (i + 1) until langs.size)
      yield (conf((langs(i), langs(j))), conf((langs(j), langs(i))))
    val live = pairs.filter(p => p._1 + p._2 > 0)
    assert(dfp == live.size)
    assert(nOff == pairs.map(p => p._1 + p._2).sum)
    val want = live.map { case (a, b) =>
      r9((a - b).toDouble * (a - b) / (a + b)) }.sum
    assert(math.abs(chi2 - math.rint(want * 1e6) / 1e6) < 1e-9, s"$chi2 vs $want")
    assert(nOff > 0, "the classifier must actually misclassify something")
    FixtureVacuity.assertNonTrivial(df("p255_bowker_symmetry"), "bowker_chi2")
  }

  test("p256: Hurst H matches the hand-built R/S regression") {
    val r = run("p256_hurst_exponent").head
    val (n, nScales, h) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    val ys = dailyCounts.map(_._2)
    assert(n == ys.size && nScales == 3)
    val t = ys.size
    val pts = Seq(1, 2, 4).map { k =>
      val segs = ys.zipWithIndex.groupBy { case (_, i) => i.toLong * k / t }
      val rss = segs.toSeq.sortBy(_._1).map { case (_, rows) =>
        val vs = rows.map(_._1.toDouble)
        val mean = vs.sum / vs.size
        var cd = 0.0; var mx = Double.MinValue; var mn = Double.MaxValue
        vs.foreach { v => cd += r9(v - mean); mx = math.max(mx, cd); mn = math.min(mn, cd) }
        val sd = math.sqrt(vs.map(v => v * v).sum / vs.size - mean * mean)
        r9((mx - mn) / sd)
      }
      (math.log(t.toDouble / k), math.log(rss.sum / rss.size))
    }
    val np = pts.size
    val sx = pts.map(p => r9(p._1)).sum; val sy = pts.map(p => r9(p._2)).sum
    val sxy = pts.map(p => r9(p._1 * p._2)).sum
    val sxx = pts.map(p => r9(p._1 * p._1)).sum
    val want = (np * sxy - sx * sy) / (np * sxx - sx * sx)
    assert(math.abs(h - math.rint(want * 1e6) / 1e6) < 1e-5, s"$h vs $want")
    assert(h > 0 && h < 1.5)
    FixtureVacuity.assertNonTrivial(df("p256_hurst_exponent"), "hurst_h")
  }

  test("p257: seasonal strength matches a hand decomposition") {
    val r = run("p257_seasonal_strength").head
    val (n, fs, amp) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    assert(n == dailyCounts.size)
    val x0 = dailyCounts.map(_._1.toEpochDay).min
    val xs = dailyCounts.map(d => (d._1.toEpochDay - x0).toDouble)
    val ys = dailyCounts.map(_._2.toDouble)
    val (sx, sy) = (xs.sum, ys.sum)
    val b = (n * xs.zip(ys).map(p => p._1 * p._2).sum - sx * sy) /
      (n * xs.map(x => x * x).sum - sx * sx)
    val a = (sy - b * sx) / n
    val det = dailyCounts.zip(xs).map { case ((d, y), x) =>
      (d.getDayOfWeek, y - a - b * x) }
    val sea = det.groupBy(_._1).view
      .mapValues(v => v.map(p => r9(p._2)).sum / v.size).toMap
    val rem = det.map { case (dow, dt) => dt - sea(dow) }
    def varOf(v: Seq[Double]) = {
      val m = v.map(r9).sum / v.size
      v.map(x => r9(x * x)).sum / v.size - m * m
    }
    val want = math.max(0.0, 1 - varOf(rem) / varOf(det.map(_._2)))
    assert(math.abs(fs - math.rint(want * 1e6) / 1e6) < 1e-5, s"$fs vs $want")
    assert(fs >= 0 && fs <= 1)
    assert(math.abs(amp - math.rint(
      sea.values.map(math.abs).max * 1e6) / 1e6) < 1e-5)
    FixtureVacuity.assertNonTrivial(df("p257_seasonal_strength"),
      "seasonal_strength", Seq(0.0, 1.0))
  }

  test("p258: entropy rate matches the literal transition walk") {
    val r = run("p258_markov_entropy_rate").head
    val (nt, k, hRate, eff) = (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getDouble(3))
    val ev = Tables.df(spark, SharedSpark.sf, "events")
      // ISO "yyyy-MM-dd HH:mm:ss[.f]" strings sort like the timestamps
      // (events ts surfaces as TimestampNTZ -> LocalDateTime here)
      .selectExpr("user_id", "event_type",
        "date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS') as tss", "event_id")
      .collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2), x.getLong(3)))
    val tr = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    ev.groupBy(_._1).values.foreach { rows =>
      rows.sortBy(r => (r._3, r._4)).map(_._2)
        .sliding(2).filter(_.size == 2)
        .foreach(w => tr((w(0), w(1))) += 1)
    }
    val n = tr.values.sum
    assert(nt == n)
    val states = tr.keys.map(_._1).toSet
    assert(k == states.size)
    val ni = tr.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val s = tr.map { case ((i, _), nij) =>
      r9(nij * math.log(nij.toDouble / ni(i))) }.sum
    val want = -s / n
    assert(math.abs(hRate - math.rint(want * 1e6) / 1e6) < 1e-9)
    assert(math.abs(eff - math.rint(want / math.log(k.toDouble) * 1e6) / 1e6) < 1.01e-6)
    assert(hRate > 0 && eff > 0 && eff <= 1)
    FixtureVacuity.assertNonTrivial(df("p258_markov_entropy_rate"),
      "entropy_rate")
  }
}
