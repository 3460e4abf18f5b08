package graft

import org.scalatest.funsuite.AnyFunSuite

/** Properties of the batch-59 operators beyond the driver gate: alpha from
  * the coincidence definition, G² keyness against a literal 2×2 recompute,
  * Cramér's V with and without the Bergsma correction, AP@10 against a
  * rank-walk recompute, Durbin–Watson from hand-fit residuals, and the
  * confusion-panel identities — with FixtureVacuity probes throughout.
  */
class PipelineBatch59Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get
  private def df(n: String) = byName(n).run(spark, SharedSpark.sf)
  private def run(n: String) = df(n).collect()

  private lazy val docs: Seq[(String, String, String, Long)] =
    Tables.df(spark, SharedSpark.sf, "documents")
      .select("text", "lang", "source", "n_chars").collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))

  private val stopRe = "\\b(the|and|of|to|in|a|is|for|on|with)\\b".r
  private val wordRe = "[a-z0-9]+".r

  /** the two binary coders exactly as the p124/p247/p252 queries define them */
  private def coders(text: String, nChars: Long): (Int, Int) = {
    val lower = text.toLowerCase
    val la = if (nChars >= 400) 1 else 0
    val lb = if (20 * stopRe.findAllIn(lower).size
      >= wordRe.findAllIn(lower).size) 1 else 0
    (la, lb)
  }

  test("p247: alpha matches the coincidence-matrix definition") {
    val r = run("p247_krippendorff_alpha").head
    val (u, dis, n0, n1, alpha) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4))
    val labs = docs.map(d => coders(d._1, d._4))
    assert(u == labs.size)
    assert(dis == labs.count { case (a, b) => a != b })
    assert(n1 == labs.map { case (a, b) => a + b }.sum)
    assert(n0 == 2 * u - n1)
    // full coincidence-matrix form: alpha = 1 - D_o/D_e with
    // D_o = 2*dis/n and D_e = 2*n0*n1/(n(n-1)), n = 2u
    val n = 2.0 * u
    val de = 2.0 * n0 * n1 / (n * (n - 1))
    val dObs = 2.0 * dis / n
    val want = 1 - dObs / de
    assert(math.abs(alpha - math.rint(want * 1e6) / 1e6) < 1e-9, s"$alpha vs $want")
    assert(alpha <= 1.0)
    FixtureVacuity.assertNonTrivial(df("p247_krippendorff_alpha"), "alpha",
      Seq(0.0, 1.0))
  }

  test("p248: signed G2 matches a literal 2x2 recompute; top-15 exact") {
    val rows = run("p248_dunning_g2").map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.length == 15 && rows.map(_._1).toSeq == (1L to 15L))
    val counts = scala.collection.mutable.Map[String, (Long, Long)]()
      .withDefaultValue((0L, 0L))
    docs.foreach { d =>
      val en = d._2 == "en"
      d._1.toLowerCase.split("\\s+").filter(_.nonEmpty).foreach { w =>
        val (a, b) = counts(w)
        counts(w) = if (en) (a + 1, b) else (a, b + 1)
      }
    }
    val ta = counts.values.map(_._1).sum.toDouble
    val tb = counts.values.map(_._2).sum.toDouble
    def g2r(a: Long, b: Long): Double = {
      val ea = ta * (a + b) / (ta + tb); val eb = tb * (a + b) / (ta + tb)
      val v = 2 * ((if (a > 0) a * math.log(a / ea) else 0.0)
        + (if (b > 0) b * math.log(b / eb) else 0.0))
      math.rint(v * 1e9) / 1e9
    }
    val want = counts.toSeq.map { case (w, (a, b)) => (w, a, b, g2r(a, b),
      if (a * tb > b * ta) 1 else -1) }
      .sortBy(t => (-t._4, t._1)).take(15)
    rows.zip(want).foreach { case ((_, tok, a, b, g2s), (ww, wa, wb, wg, ws)) =>
      assert(tok == ww && a == wa && b == wb, s"$tok vs $ww")
      assert(math.abs(g2s - math.rint(ws * wg * 1e6) / 1e6) < 1e-9, tok)
    }
    FixtureVacuity.assertDiscriminates(df("p248_dunning_g2"), "g2_signed", 3)
  }

  test("p249: chi2 / V / corrected V match the dense-grid recompute") {
    val r = run("p249_cramers_v").head
    val (n, nr, nc, chi2, v, vc) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5))
    val langs = docs.map(_._2).distinct.sorted
    val srcs = docs.map(_._3).distinct.sorted
    assert(n == docs.size && nr == langs.size && nc == srcs.size)
    val cnt = docs.groupBy(d => (d._2, d._3)).view.mapValues(_.size.toLong).toMap
    val rt = langs.map(l => l -> docs.count(_._2 == l).toLong).toMap
    val ct = srcs.map(s => s -> docs.count(_._3 == s).toLong).toMap
    val wantChi = (for (l <- langs; s <- srcs) yield {
      val e = rt(l).toDouble * ct(s) / n
      val o = cnt.getOrElse((l, s), 0L)
      math.rint((o - e) * (o - e) / e * 1e9) / 1e9
    }).sum
    assert(math.abs(chi2 - math.rint(wantChi * 1e6) / 1e6) < 1e-9)
    val phi2 = wantChi / n
    assert(math.abs(v - math.rint(math.sqrt(phi2 / math.min(nr - 1, nc - 1)) * 1e6) / 1e6) < 1e-9)
    val phi2c = math.max(0.0, phi2 - (nr - 1.0) * (nc - 1.0) / (n - 1))
    val rc = nr - (nr - 1.0) * (nr - 1.0) / (n - 1)
    val cc = nc - (nc - 1.0) * (nc - 1.0) / (n - 1)
    val wantVc = math.sqrt(phi2c / math.min(rc - 1, cc - 1))
    assert(math.abs(vc - math.rint(wantVc * 1e6) / 1e6) < 1e-9)
    assert(vc <= v + 1e-9, "the correction can only shrink V")
    FixtureVacuity.assertNonTrivial(df("p249_cramers_v"), "cramers_v_corrected")
  }

  test("p250: AP@10 matches a rank-walk recompute over the BM25 frame") {
    val rows = run("p250_average_precision").map(r => (r.getString(0),
      r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty && rows.length <= 6)
    // rebuild the probe frame exactly: docs tokenized, top-6 len>=4 tokens;
    // relevance = substantial doc (n_chars >= 400), DECOUPLED from the score
    val docTokens = Tables.df(spark, SharedSpark.sf, "documents")
      .select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split("\\s+")
        .filter(_.nonEmpty).toSeq, r.getLong(2)))
    val dl = docTokens.map { case (id, ts, _) => id -> ts.size }.toMap
    val nc = docTokens.map { case (id, _, n) => id -> n }.toMap
    val avgdl = dl.values.sum.toDouble / dl.size
    val freq = docTokens.flatMap(_._2).filter(_.length >= 4)
      .groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(6).map(_._1)
    val apByTerm = freq.flatMap { term =>
      val tf = docTokens.map { case (id, ts, _) => (id, ts.count(_ == term)) }
        .filter(_._2 > 0)
      val scored = tf.map { case (id, f) =>
        val score = f.toDouble * 2.2 / (f + 1.2 * (0.25 + 0.75 * dl(id) / avgdl))
        (id, nc(id) >= 400, score)
      }.sortBy { case (id, _, s) => (-s, id) }
      val nrel = scored.count(_._2)
      if (nrel == 0) None else {
        var cum = 0
        val terms = scored.zipWithIndex.take(10).collect {
          case ((_, rel, _), i) if { if (rel) cum += 1; rel } =>
            math.rint(cum.toDouble / (i + 1) * 1e9) / 1e9
        }
        Some(term -> (nrel.toLong, terms.sum / math.min(nrel, 10)))
      }
    }.toMap
    rows.foreach { case (term, nrel, ap, _) =>
      val (wantN, wantAp) = apByTerm(term)
      assert(nrel == wantN, term)
      assert(math.abs(ap - math.rint(wantAp * 1e6) / 1e6) < 1e-9,
        s"$term: $ap vs $wantAp")
      assert(ap >= 0 && ap <= 1)
    }
    val wantMap = apByTerm.values.map(v => math.rint(v._2 * 1e9) / 1e9).sum /
      apByTerm.size
    assert(math.abs(rows.head._4 - math.rint(wantMap * 1e6) / 1e6) < 1.01e-6)
    FixtureVacuity.assertDiscriminates(df("p250_average_precision"), "ap10", 2)
  }

  test("p251: DW matches hand-fit OLS residual recompute") {
    val r = run("p251_durbin_watson").head
    val (n, slope, dw, rho) = (r.getLong(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3))
    val daily = Tables.df(spark, SharedSpark.sf, "events")
      .selectExpr("cast(ts as date) as d").groupBy("d").count()
      .collect().map(x => (x.getDate(0).toLocalDate.toEpochDay, x.getLong(1)))
      .sortBy(_._1)
    assert(n == daily.length)
    val x0 = daily.map(_._1).min
    val xs = daily.map(d => (d._1 - x0).toDouble)
    val ys = daily.map(_._2.toDouble)
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(slope - math.rint(b * 1e6) / 1e6) < 1e-9)
    val a = (sy - b * sx) / n
    val es = xs.zip(ys).map { case (xi, yi) => yi - a - b * xi }
    val num = es.sliding(2).map { w =>
      math.rint((w(1) - w(0)) * (w(1) - w(0)) * 1e9) / 1e9 }.sum
    val den = es.map(e => math.rint(e * e * 1e9) / 1e9).sum
    assert(math.abs(dw - math.rint(num / den * 1e6) / 1e6) < 1e-5,
      s"$dw vs ${num / den}")
    assert(math.abs(rho - math.rint((1 - num / den / 2) * 1e6) / 1e6) < 1e-5)
    assert(dw > 0 && dw < 4)
    FixtureVacuity.assertNonTrivial(df("p251_durbin_watson"), "dw_stat",
      Seq(0.0, 2.0, 4.0))
  }

  test("p252: confusion panel matches integer counts and its identities") {
    val r = run("p252_mcc_quality").head
    val (tp, fn, fp, tn) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val (prec, rec, f1, bacc, j, mcc) = (r.getDouble(4), r.getDouble(5),
      r.getDouble(6), r.getDouble(7), r.getDouble(8), r.getDouble(9))
    val labs = docs.map(d => coders(d._1, d._4))
    assert(tp == labs.count(_ == (1, 1)) && fn == labs.count(_ == (1, 0)))
    assert(fp == labs.count(_ == (0, 1)) && tn == labs.count(_ == (0, 0)))
    assert(math.abs(prec - math.rint(tp.toDouble / (tp + fp) * 1e6) / 1e6) < 1e-9)
    assert(math.abs(rec - math.rint(tp.toDouble / (tp + fn) * 1e6) / 1e6) < 1e-9)
    val wantF1 = 2.0 * tp / (2.0 * tp + fp + fn)
    assert(math.abs(f1 - math.rint(wantF1 * 1e6) / 1e6) < 1e-9)
    // Youden's J is exactly 2*balanced_accuracy - 1 (both 6dp-rounded, so
    // allow one ulp)
    assert(math.abs(j - (2 * bacc - 1)) < 2.01e-6)
    val wantMcc = (tp.toDouble * tn - fp.toDouble * fn) /
      math.sqrt((tp.toDouble + fp) * (tp.toDouble + fn)
        * (tn.toDouble + fp) * (tn.toDouble + fn))
    assert(math.abs(mcc - math.rint(wantMcc * 1e6) / 1e6) < 1e-9)
    assert(mcc >= -1 && mcc <= 1)
    FixtureVacuity.assertNonTrivial(df("p252_mcc_quality"), "mcc",
      Seq(0.0, 1.0, -1.0))
  }
}
