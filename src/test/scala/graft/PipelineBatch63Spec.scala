package graft

import org.scalatest.funsuite.AnyFunSuite

/** Properties of the batch-63 operators beyond the driver gate: SampEn
  * against an O(n²) template scan, Cox–Stuart against explicit half-pairs,
  * Grubbs against a direct extreme scan, AC1/κ against hand-counted
  * agreement cells (including the paradox contrast), PACF against the
  * Durbin–Levinson recursion on a recomputed ACF, and MRR against a
  * rank-walk over the rebuilt BM25 frame — with FixtureVacuity probes
  * throughout.
  */
class PipelineBatch63Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get
  private def df(n: String) = byName(n).run(spark, SharedSpark.sf)
  private def run(n: String) = df(n).collect()

  private lazy val dailyCounts: Seq[(java.time.LocalDate, Long)] =
    Tables.df(spark, SharedSpark.sf, "events")
      .selectExpr("cast(ts as date) as d").groupBy("d").count()
      .collect().toSeq.map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .sortBy(_._1.toEpochDay)

  private def r6(x: Double) = math.rint(x * 1e6) / 1e6

  test("p271: A/B counts match the O(n^2) template scan") {
    val r = run("p271_sample_entropy").head
    val (n, b, a, se) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    val ys = dailyCounts.map(_._2)
    assert(n == ys.size)
    val mu = ys.sum.toDouble / n
    val sd = math.sqrt(ys.map(y => y.toDouble * y).sum / n - mu * mu)
    val rr = 0.5 * sd
    val tpl = ys.sliding(3).filter(_.size == 3).toIndexedSeq
    var bc = 0L; var ac = 0L
    for (i <- tpl.indices; j <- (i + 1) until tpl.size) {
      if (math.abs(tpl(i)(0) - tpl(j)(0)) <= rr
        && math.abs(tpl(i)(1) - tpl(j)(1)) <= rr) {
        bc += 1
        if (math.abs(tpl(i)(2) - tpl(j)(2)) <= rr) ac += 1
      }
    }
    assert(b == bc && a == ac, s"($b,$a) vs ($bc,$ac)")
    assert(math.abs(se - r6(-math.log(ac.toDouble / bc))) < 1e-9)
    assert(a > 0 && b > a, "fixture-vacuity: degenerate match counts")
    FixtureVacuity.assertNonTrivial(df("p271_sample_entropy"), "sampen")
  }

  test("p272: S+/S- match the explicit half-pairs") {
    val r = run("p272_cox_stuart").head
    val (np, sp, sm, z) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    val ys = dailyCounts.map(_._2)
    val h = (ys.size + 1) / 2
    val pairs = (0 until ys.size / 2).map(i => (ys(i), ys(i + h)))
    val wantSp = pairs.count(p => p._2 > p._1).toLong
    val wantSm = pairs.count(p => p._2 < p._1).toLong
    assert(sp == wantSp && sm == wantSm && np == wantSp + wantSm)
    assert(math.abs(z - r6((wantSp - wantSm).toDouble
      / math.sqrt((wantSp + wantSm).toDouble))) < 1e-9)
    FixtureVacuity.assertNonTrivial(df("p272_cox_stuart"), "n_pairs")
  }

  test("p273: G and the achieving date match the direct scan") {
    val r = run("p273_grubbs_extremes").head
    val (n, date, side, g) =
      (r.getLong(0), r.getDate(1).toLocalDate, r.getString(2), r.getDouble(3))
    val ys = dailyCounts.map(_._2)
    assert(n == ys.size)
    val mu = ys.sum.toDouble / n
    val s = math.sqrt(ys.map(y => (y - mu) * (y - mu)).sum / (n - 1))
    val gmax = (ys.max - mu) / s
    val gmin = (mu - ys.min) / s
    val wantSide = if (gmax >= gmin) "high" else "low"
    val target = if (wantSide == "high") ys.max else ys.min
    val wantDate = dailyCounts.filter(_._2 == target).map(_._1)
      .minBy(_.toEpochDay)
    assert(side == wantSide && date == wantDate)
    assert(math.abs(g - r6(math.max(gmax, gmin))) < 1e-6)
    FixtureVacuity.assertNonTrivial(df("p273_grubbs_extremes"), "g_stat")
  }

  test("p274: AC1 and kappa match hand-counted agreement cells") {
    val r = run("p274_gwet_ac1").head
    val (n, po, ac1, kappa) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val stopRe = "\\b(the|and|of|to|in|a|is|for|on|with)\\b".r
    val wordRe = "[a-z0-9]+".r
    val cells = Tables.df(spark, SharedSpark.sf, "documents")
      .select("n_chars", "text").collect().map { row =>
        val lo = row.getString(1).toLowerCase
        val la = row.getLong(0) >= 400
        val lb = 20 * stopRe.findAllIn(lo).size >= wordRe.findAllIn(lo).size
        (la, lb)
      }
    assert(n == cells.length)
    val a = cells.count(c => c._1 && c._2).toDouble
    val b = cells.count(c => c._1 && !c._2).toDouble
    val c = cells.count(c => !c._1 && c._2).toDouble
    val d = cells.count(c => !c._1 && !c._2).toDouble
    val nn = n.toDouble
    val wantPo = (a + d) / nn
    val pa1 = (a + b) / nn; val pb1 = (a + c) / nn
    val piHat = (pa1 + pb1) / 2
    val peg = 2 * piHat * (1 - piHat)
    val pek = pa1 * pb1 + (1 - pa1) * (1 - pb1)
    assert(math.abs(po - r6(wantPo)) < 1e-9)
    assert(math.abs(ac1 - r6((wantPo - peg) / (1 - peg))) < 1e-6)
    assert(math.abs(kappa - r6((wantPo - pek) / (1 - pek))) < 1e-6)
    // the fixture must actually exhibit the prevalence asymmetry AC1
    // exists for: both coefficients defined and different
    assert(math.abs(ac1 - kappa) > 1e-9, "AC1 == kappa — vacuous contrast")
    FixtureVacuity.assertNonTrivial(df("p274_gwet_ac1"), "ac1")
  }

  test("p275: PACF matches Durbin-Levinson on the recomputed ACF") {
    val rows = run("p275_pacf_durbin_levinson")
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(rows.map(_._1) sameElements Array(1L, 2L, 3L))
    val ys = dailyCounts.map(_._2.toDouble)
    val n = ys.size
    val mu = ys.sum / n
    def r9(x: Double) = math.rint(x * 1e9) / 1e9
    val den = ys.map(y => r9((y - mu) * (y - mu))).sum
    def acf(k: Int) = ys.drop(k).zip(ys.dropRight(k))
      .map { case (a0, b0) => r9((a0 - mu) * (b0 - mu)) }.sum / den
    val (r1, r2, r3) = (acf(1), acf(2), acf(3))
    val p22 = (r2 - r1 * r1) / (1 - r1 * r1)
    val p21 = r1 * (1 - p22)
    val p33 = (r3 - p21 * r2 - p22 * r1) / (1 - p21 * r1 - p22 * r2)
    assert(math.abs(rows(0)._2 - r6(r1)) < 1e-6)
    assert(math.abs(rows(0)._3 - r6(r1)) < 1e-6)
    assert(math.abs(rows(1)._3 - r6(p22)) < 1e-6, s"${rows(1)._3} vs $p22")
    assert(math.abs(rows(2)._3 - r6(p33)) < 1e-6, s"${rows(2)._3} vs $p33")
    FixtureVacuity.assertDiscriminates(df("p275_pacf_durbin_levinson"), "pacf", 2)
  }

  test("p276: MRR and hit@10 match the rank-walk recompute") {
    val rows = run("p276_mrr_hit_at_k").map(r => (r.getString(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty && rows.length <= 6)
    val docTokens = Tables.df(spark, SharedSpark.sf, "documents")
      .select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split("\\s+")
        .filter(_.nonEmpty).toSeq, r.getLong(2)))
    val dl = docTokens.map { case (id, ts, _) => id -> ts.size }.toMap
    val nc = docTokens.map { case (id, _, n) => id -> n }.toMap
    val avgdl = dl.values.sum.toDouble / dl.size
    val probes = docTokens.flatMap(_._2).filter(_.length >= 4)
      .groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(6).map(_._1)
    val firstRank = probes.flatMap { term =>
      val scored = docTokens.map { case (id, ts, _) => (id, ts.count(_ == term)) }
        .filter(_._2 > 0)
        .map { case (id, f) =>
          val score = f.toDouble * 2.2 / (f + 1.2 * (0.25 + 0.75 * dl(id) / avgdl))
          (id, nc(id) >= 400, score)
        }.sortBy { case (id, _, s) => (-s, id) }
      val idx = scored.indexWhere(_._2)
      if (idx < 0) None else Some(term -> (idx + 1).toLong)
    }.toMap
    val wantMrr = firstRank.values
      .map(fr => math.rint(1e9 / fr) / 1e9).sum / firstRank.size
    val wantHit = firstRank.values.count(_ <= 10).toDouble / firstRank.size
    rows.foreach { case (term, fr, rr, mrr, hit) =>
      assert(fr == firstRank(term), term)
      assert(math.abs(rr - r6(1.0 / fr)) < 1e-9)
      assert(math.abs(mrr - r6(wantMrr)) < 1.01e-6)
      assert(math.abs(hit - r6(wantHit)) < 1e-9)
    }
    FixtureVacuity.assertDiscriminates(df("p276_mrr_hit_at_k"), "first_rank", 2)
  }
}
