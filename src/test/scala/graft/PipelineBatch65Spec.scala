package graft

import org.scalatest.funsuite.AnyFunSuite

/** Properties of the batch-65 operators beyond the driver gate: Tukey q
  * against group-sum recomputes, Dunn z against a midrank recompute, the
  * readability formulas against regex counts, Nelson–Aalen against a
  * sequential risk-set walk, Lepage against its two component recomputes,
  * and Page's L against per-block rank loops — with FixtureVacuity probes
  * throughout.
  */
class PipelineBatch65Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get
  private def df(n: String) = byName(n).run(spark, SharedSpark.sf)
  private def run(n: String) = df(n).collect()

  private def r9(x: Double) = math.rint(x * 1e9) / 1e9
  private def r6(x: Double) = math.rint(x * 1e6) / 1e6

  private lazy val bySource: Map[String, Seq[Long]] =
    Tables.df(spark, SharedSpark.sf, "documents")
      .select("source", "n_chars").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSeq).toMap

  test("p283: q matches the group-sum recompute") {
    val rows = run("p283_tukey_pairwise")
      .map(r => ((r.getString(0), r.getString(1)), (r.getDouble(2), r.getDouble(3))))
      .toMap
    val k = bySource.size
    assert(rows.size == k * (k - 1) / 2)
    val nTot = bySource.values.map(_.size).sum
    val msw = bySource.values.map { xs =>
      val s1 = xs.map(BigInt(_)).sum.toDouble
      val s2 = xs.map(x => BigInt(x) * BigInt(x)).sum.toDouble
      math.rint((s2 - s1 * s1 / xs.size) * 1e6) / 1e6
    }.sum / (nTot - k)
    for (a <- bySource.keys; b <- bySource.keys if a < b) {
      val (xa, xb) = (bySource(a), bySource(b))
      val diff = xa.sum.toDouble / xa.size - xb.sum.toDouble / xb.size
      val q = math.abs(diff) / math.sqrt(msw / 2 * (1.0 / xa.size + 1.0 / xb.size))
      val (gotD, gotQ) = rows((a, b))
      assert(math.abs(gotD - r6(diff)) < 1e-6, s"($a,$b) diff")
      assert(math.abs(gotQ - r6(q)) < 1e-5, s"($a,$b): $gotQ vs $q")
    }
    FixtureVacuity.assertDiscriminates(df("p283_tukey_pairwise"), "q_stat", 2)
  }

  test("p284: z matches the midrank recompute") {
    val rows = run("p284_dunn_posthoc")
      .map(r => ((r.getString(0), r.getString(1)), (r.getDouble(2), r.getDouble(3))))
      .toMap
    val all = bySource.toSeq.flatMap { case (s, xs) => xs.map(x => (s, x)) }
    val n = all.size
    val sorted = all.map(_._2).sorted.zipWithIndex
    val rankOf = sorted.groupBy(_._1).view
      .mapValues(g => g.map(_._2 + 1).sum.toDouble / g.size).toMap
    val tie = all.map(_._2).groupBy(identity).values
      .map(g => g.size.toLong).filter(_ > 1)
      .map(t => (t * t * t - t).toDouble).sum
    val s2 = n.toDouble * (n + 1) / 12 - tie / (12.0 * (n - 1))
    val meanRank = bySource.view.mapValues(xs => xs.map(rankOf).sum / xs.size)
    for (a <- bySource.keys; b <- bySource.keys if a < b) {
      val rdiff = meanRank(a) - meanRank(b)
      val z = rdiff / math.sqrt(s2 * (1.0 / bySource(a).size + 1.0 / bySource(b).size))
      val (gotD, gotZ) = rows((a, b))
      assert(math.abs(gotD - r6(rdiff)) < 1e-6, s"($a,$b) rdiff")
      assert(math.abs(gotZ - r6(z)) < 1e-5, s"($a,$b): $gotZ vs $z")
    }
    FixtureVacuity.assertDiscriminates(df("p284_dunn_posthoc"), "z_dunn", 2)
  }

  test("p285: formulas match the regex counts") {
    val rows = run("p285_readability").map(r => r.getString(0) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    val wordRe = "[a-z0-9]+".r
    val senRe = "[.!?]+".r
    val sylRe = "[aeiouy]+".r
    val docs = Tables.df(spark, SharedSpark.sf, "documents")
      .select("source", "text").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSeq)
    docs.foreach { case (src, texts) =>
      val w = texts.map(t => wordRe.findAllIn(t.toLowerCase).size.toLong).sum
      val sen = texts.map(t => math.max(senRe.findAllIn(t).size, 1).toLong).sum
      val syl = texts.map(t => sylRe.findAllIn(t.toLowerCase).size.toLong).sum
      val (gw, gs, gy, fl, fk) = rows(src)
      assert(gw == w && gs == sen && gy == syl, src)
      val wantFl = 206.835 - 1.015 * w / sen - 84.6 * syl / w
      val wantFk = 0.39 * w / sen + 11.8 * syl / w - 15.59
      assert(math.abs(fl - r6(wantFl)) < 1e-6, s"$src flesch")
      assert(math.abs(fk - r6(wantFk)) < 1e-6, s"$src fk")
    }
    FixtureVacuity.assertDiscriminates(df("p285_readability"), "flesch_ease", 2)
  }

  /** (event, t_day) per signup user — the p188/p277 construction. */
  private lazy val survival: Seq[(Int, Long)] = {
    implicit val ldtOrd: Ordering[java.time.LocalDateTime] =
      Ordering.fromLessThan(_.isBefore(_))
    Tables.df(spark, SharedSpark.sf, "events")
      .selectExpr("user_id", "ts", "event_type").collect()
      .map(x => (x.getLong(0), x.getAs[java.time.LocalDateTime](1), x.getString(2)))
      .groupBy(_._1).values.flatMap { rows =>
        val signups = rows.filter(_._3 == "signup").map(_._2)
        if (signups.isEmpty) None else {
          val signup = signups.min
          val lastSeen = rows.map(_._2).max
          val purch = rows
            .filter(e => e._3 == "purchase" && !e._2.isBefore(signup)).map(_._2)
          val sd = signup.toLocalDate
          val (event, tEnd) =
            if (purch.nonEmpty) (1, purch.min.toLocalDate)
            else (0, lastSeen.toLocalDate)
          Some((event, tEnd.toEpochDay - sd.toEpochDay))
        }
      }.toSeq
  }

  test("p286: H and its variance match a sequential risk-set walk") {
    val rows = run("p286_nelson_aalen").map(r =>
      (r.getAs[Number](0).longValue, r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val eventTimes = survival.filter(_._1 == 1).map(_._2).distinct.sorted
    assert(rows.map(_._1).toSeq == eventTimes)
    var h = 0.0; var v = 0.0
    // walk ALL distinct times in order so the cumsum matches the op's
    // (censoring-only times contribute d=0 terms, i.e. nothing)
    val allTimes = survival.map(_._2).distinct.sorted
    val got = rows.map(r => r._1 -> r).toMap
    allTimes.foreach { t =>
      val nr = survival.count(_._2 >= t)
      val d = survival.count(s => s._1 == 1 && s._2 == t)
      h += r9(d.toDouble / nr)
      v += r9(d.toDouble / (nr.toDouble * nr))
      if (d > 0) {
        val (_, gotNr, gotD, gotH, gotV) = got(t)
        assert(gotNr == nr && gotD == d, s"t=$t")
        assert(math.abs(gotH - r6(h)) < 1e-6, s"t=$t h")
        assert(math.abs(gotV - r6(v)) < 1e-6, s"t=$t v")
      }
    }
    FixtureVacuity.assertDiscriminates(df("p286_nelson_aalen"), "na_cumhaz", 2)
  }

  test("p287: L matches the two component recomputes") {
    val r = run("p287_lepage").head
    val (n1, n0, zw, zab, l) = (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4))
    val rows = Tables.df(spark, SharedSpark.sf, "documents")
      .selectExpr("lang = 'en' as en", "n_chars").collect()
      .map(x => (x.getBoolean(0), x.getLong(1)))
    assert(n1 == rows.count(_._1) && n0 == rows.count(!_._1))
    val n = rows.length
    // Wilcoxon with midranks + tie-corrected variance
    val sorted = rows.map(_._2).sorted.zipWithIndex
    val rankOf = sorted.groupBy(_._1).view
      .mapValues(g => g.map(_._2 + 1).sum.toDouble / g.size).toMap
    val wSum = rows.filter(_._1).map(p => rankOf(p._2)).sum
    val tie = rows.map(_._2).groupBy(identity).values
      .map(g => g.size.toLong).map(t => (t * t * t - t).toDouble).sum
    val varW = n1.toDouble * n0 / 12 * ((n + 1) - tie / (n.toDouble * (n - 1)))
    val wantZw = (wSum - n1.toDouble * (n + 1) / 2) / math.sqrt(varW)
    assert(math.abs(zw - r6(wantZw)) < 1e-6, s"$zw vs $wantZw")
    // Ansari-Bradley (the p278 recompute)
    val posScore = (1 to n).map(i => math.min(i, n + 1 - i).toDouble)
    val byVal = rows.map(_._2).sorted.zipWithIndex.groupBy(_._1)
    val scoreOf = byVal.map { case (v, g) =>
      v -> g.map(p => posScore(p._2)).sum / g.size
    }
    val wab = rows.filter(_._1).map(p => scoreOf(p._2)).sum
    val sAll = rows.map(p => scoreOf(p._2))
    val ssum = sAll.sum
    val ssq = sAll.groupBy(identity).map { case (s0, g) => r9(s0 * s0 * g.size) }.sum
    val varAb = n1.toDouble * n0 / (n.toDouble * (n - 1)) * (n * ssq - ssum * ssum) / n
    val wantZab = (wab - n1 * ssum / n) / math.sqrt(varAb)
    assert(math.abs(zab - r6(wantZab)) < 2e-6, s"$zab vs $wantZab")
    assert(math.abs(l - r6(wantZw * wantZw + wantZab * wantZab)) < 1e-4)
    FixtureVacuity.assertNonTrivial(df("p287_lepage"), "lepage_l")
  }

  test("p288: L matches per-block rank loops") {
    val r = run("p288_page_trend").head
    val (b, k, pageL, z) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    val daily = Tables.df(spark, SharedSpark.sf, "events")
      .selectExpr("cast(ts as date) as d").groupBy("d").count()
      .collect().map(x => (x.getDate(0).toLocalDate.toEpochDay, x.getLong(1)))
      .sortBy(_._1)
    val d0 = daily.map(_._1).min
    val cells = daily.map { case (d, c) => (d - d0, c) }.filter(_._1 < 28)
      .map { case (off, c) => ((off % 7, off / 7 + 1), c) }.toMap
    assert(b == 7 && k == 4)
    var l2 = 0L
    for (blk <- 0L until 7L; wk <- 1L to 4L) {
      val v = cells((blk, wk))
      val others = (1L to 4L).map(w => cells((blk, w)))
      val r2 = 2 * others.count(_ < v) + others.count(_ == v) + 1
      l2 += wk * r2
    }
    assert(math.abs(pageL - l2 / 2.0) < 1e-9, s"$pageL vs ${l2 / 2.0}")
    val e = 7.0 * 4 * 25 / 4
    val varL = 7.0 * 16 * 5 * 15 / 144
    assert(math.abs(z - r6((l2 / 2.0 - e) / math.sqrt(varL))) < 1e-6)
    FixtureVacuity.assertNonTrivial(df("p288_page_trend"), "z_stat")
  }
}
