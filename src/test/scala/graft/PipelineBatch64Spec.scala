package graft

import org.scalatest.funsuite.AnyFunSuite

/** Properties of the batch-64 operators beyond the driver gate: the
  * log-rank O/E/V against a per-time loop over hand-built risk sets,
  * Ansari–Bradley against position-scored sorting, CUSUM-of-squares
  * against a sequential scan, Bartels RVN against a rank recompute, KPSS
  * against the partial-sum definition, and Cronbach's α against the
  * variance identity — with FixtureVacuity probes throughout.
  */
class PipelineBatch64Spec extends AnyFunSuite {
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

  test("p277: O/E/V match a per-time loop over hand-built risk sets") {
    val r = run("p277_logrank_test").head
    val (n, nt, o1, e1, chi2) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getDouble(4))
    // rebuild (grp, event, t_day) per signup user from raw events
    implicit val ldtOrd: Ordering[java.time.LocalDateTime] =
      Ordering.fromLessThan(_.isBefore(_))
    val evs = Tables.df(spark, SharedSpark.sf, "events")
      .selectExpr("user_id", "ts", "event_type").collect()
      .map(x => (x.getLong(0),
        x.getAs[java.time.LocalDateTime](1), x.getString(2)))
      .groupBy(_._1)
    val subj = evs.values.flatMap { rows =>
      val signups = rows.filter(_._3 == "signup").map(_._2)
      if (signups.isEmpty) None else {
        val signup = signups.min
        val lastSeen = rows.map(_._2).max
        val purch = rows
          .filter(e => e._3 == "purchase" && !e._2.isBefore(signup)).map(_._2)
        val sd = signup.toLocalDate
        val grp = if (sd.getDayOfMonth == 1) 1 else 0
        val (event, tEnd) =
          if (purch.nonEmpty) (1, purch.min.toLocalDate)
          else (0, lastSeen.toLocalDate)
        Some((grp, event, tEnd.toEpochDay - sd.toEpochDay))
      }
    }.toSeq
    assert(n == subj.size)
    val eventTimes = subj.filter(_._2 == 1).map(_._3).distinct.sorted
    assert(nt == eventTimes.size)
    var o = 0L; var e = 0.0; var v = 0.0
    eventTimes.foreach { t =>
      val n1 = subj.count(s => s._1 == 1 && s._3 >= t).toDouble
      val n0 = subj.count(s => s._1 == 0 && s._3 >= t).toDouble
      val d1 = subj.count(s => s._1 == 1 && s._2 == 1 && s._3 == t).toDouble
      val d0 = subj.count(s => s._1 == 0 && s._2 == 1 && s._3 == t).toDouble
      val ntot = n1 + n0; val dtot = d1 + d0
      o += d1.toLong
      e += r9(dtot * n1 / ntot)
      if (ntot > 1)
        v += r9(dtot * n1 / ntot * (1 - n1 / ntot) * (ntot - dtot) / (ntot - 1))
    }
    assert(o1 == o, s"$o1 vs $o")
    assert(math.abs(e1 - r6(e)) < 1e-6, s"$e1 vs $e")
    assert(math.abs(chi2 - r6((o - e) * (o - e) / v)) < 1e-5, s"$chi2")
    // both cohorts must be populated, else the test is vacuous
    assert(subj.count(_._1 == 1) > 0 && subj.count(_._1 == 0) > 0)
    FixtureVacuity.assertNonTrivial(df("p277_logrank_test"), "logrank_chi2")
  }

  test("p278: W and z match the position-scored sort recompute") {
    val r = run("p278_ansari_bradley").head
    val (n1, n0, w, z) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    val rows = Tables.df(spark, SharedSpark.sf, "documents")
      .selectExpr("lang = 'en' as en", "n_chars").collect()
      .map(x => (x.getBoolean(0), x.getLong(1)))
    assert(n1 == rows.count(_._1) && n0 == rows.count(!_._1))
    val n = rows.length
    val sorted = rows.sortBy(_._2)
    // position scores min(i, N+1-i), tie-block averaged
    val posScore = (1 to n).map(i => math.min(i, n + 1 - i).toDouble)
    val byVal = sorted.zipWithIndex.groupBy(_._1._2)
    val scoreOf = byVal.map { case (v, g) =>
      v -> g.map(p => posScore(p._2)).sum / g.size
    }
    val wantW = rows.filter(_._1).map(p => scoreOf(p._2)).sum
    assert(math.abs(w - r6(wantW)) < 1e-6, s"$w vs $wantW")
    val sAll = rows.map(p => scoreOf(p._2))
    val ssum = sAll.sum
    val ssq = sAll.groupBy(identity).map { case (s0, g) => r9(s0 * s0 * g.size) }.sum
    val mean = n1 * ssum / n
    val varW = n1.toDouble * n0 / (n.toDouble * (n - 1)) * (n * ssq - ssum * ssum) / n
    assert(math.abs(z - r6((wantW - mean) / math.sqrt(varW))) < 2e-6, s"$z")
    FixtureVacuity.assertNonTrivial(df("p278_ansari_bradley"), "z_stat")
  }

  test("p279: D and peak date match the sequential scan") {
    val r = run("p279_cusum_squares").head
    val (n, peak, d) = (r.getLong(0), r.getDate(1).toLocalDate, r.getDouble(2))
    val ys = dailyCounts.map(_._2.toDouble)
    assert(n == ys.size)
    val mu = ys.sum / n
    val e2 = ys.map(y => r9((y - mu) * (y - mu)))
    val tot = e2.sum
    var cum = 0.0; var best = -1.0; var bestAt = dailyCounts.head._1
    e2.zipWithIndex.foreach { case (e, i) =>
      cum += e
      val dv = math.abs(cum / tot - (i + 1).toDouble / n)
      if (dv > best) { best = dv; bestAt = dailyCounts(i)._1 }
    }
    assert(peak == bestAt)
    assert(math.abs(d - r6(best)) < 1e-9, s"$d vs $best")
    FixtureVacuity.assertNonTrivial(df("p279_cusum_squares"), "d_stat")
  }

  test("p280: RVN matches the midrank recompute") {
    val r = run("p280_bartels_rank").head
    val (n, rvn, z) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    val ys = dailyCounts.map(_._2)
    assert(n == ys.size)
    val sorted = ys.sorted.zipWithIndex
    val rankOf = sorted.groupBy(_._1).view
      .mapValues(g => g.map(_._2 + 1).sum.toDouble / g.size).toMap
    val rk = ys.map(rankOf)
    val num = rk.sliding(2).map(p => (p(0) - p(1)) * (p(0) - p(1))).sum
    val rbar = (n + 1).toDouble / 2
    val den = rk.map(x => (x - rbar) * (x - rbar)).sum
    val want = num / den
    assert(math.abs(rvn - r6(want)) < 1e-9, s"$rvn vs $want")
    val nn = n.toDouble
    val varR = 4.0 * (nn - 2) * (5 * nn * nn - 2 * nn - 9) /
      (5.0 * nn * (nn + 1) * (nn - 1) * (nn - 1))
    assert(math.abs(z - r6((want - 2) / math.sqrt(varR))) < 1e-6)
    FixtureVacuity.assertNonTrivial(df("p280_bartels_rank"), "rvn")
  }

  test("p281: eta matches the partial-sum definition") {
    val r = run("p281_kpss_stationarity").head
    val (n, lrv, eta) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    val ys = dailyCounts.map(_._2.toDouble)
    assert(n == ys.size)
    val mu = ys.sum / n
    val e = ys.map(y => r9(y - mu))
    val sCum = e.scanLeft(0.0)(_ + _).drop(1)
    val ss = sCum.map(s0 => r9(s0 * s0)).sum
    val g0 = e.map(x => r9(x * x)).sum
    val g1 = e.drop(1).zip(e.dropRight(1)).map { case (a, b) => r9(a * b) }.sum
    val g2 = e.drop(2).zip(e.dropRight(2)).map { case (a, b) => r9(a * b) }.sum
    val wantLrv = (g0 + 2 * (2.0 / 3) * g1 + 2 * (1.0 / 3) * g2) / n
    assert(math.abs(lrv - r6(wantLrv)) < 1e-6, s"$lrv vs $wantLrv")
    assert(math.abs(eta - r6(ss / (n.toDouble * n * wantLrv))) < 1e-6)
    FixtureVacuity.assertNonTrivial(df("p281_kpss_stationarity"), "kpss_eta")
  }

  test("p282: alpha matches the variance identity") {
    val r = run("p282_cronbach_alpha").head
    val (n, k, sv, vt, alpha) = (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4))
    val raw = Tables.df(spark, SharedSpark.sf, "events")
      .selectExpr("cast(ts as date) as d", "event_type").collect()
      .groupBy(x => (x.getDate(0).toLocalDate, x.getString(1)))
      .view.mapValues(_.size.toLong).toMap
    val days = raw.keys.map(_._1).toSeq.distinct
    val types = raw.keys.map(_._2).toSeq.distinct
    assert(n == days.size && k == types.size)
    def sampleVar(xs: Seq[Double]) = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    val wantSv = types.map { t =>
      r9(sampleVar(days.map(d => raw.getOrElse((d, t), 0L).toDouble)))
    }.sum
    val totals = days.map(d => types.map(t => raw.getOrElse((d, t), 0L)).sum.toDouble)
    val wantVt = sampleVar(totals)
    assert(math.abs(sv - r6(wantSv)) < 1e-5, s"$sv vs $wantSv")
    assert(math.abs(vt - r6(wantVt)) < 1e-5, s"$vt vs $wantVt")
    assert(math.abs(alpha - r6(k.toDouble / (k - 1) * (1 - wantSv / wantVt))) < 1e-6)
    FixtureVacuity.assertNonTrivial(df("p282_cronbach_alpha"), "cronbach_alpha")
  }
}
