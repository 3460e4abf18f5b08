package graft

import org.scalatest.funsuite.AnyFunSuite

/** Properties of the batch-53 operators beyond the driver gate: plain-Scala
  * recomputations of each statistic from the raw sf0.001 tables, plus the
  * structural invariants each estimator must satisfy (cell accounting,
  * rank permutations, sketch error bounds, DCG dominance).
  */
class PipelineBatch53Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get
  private def run(n: String) = byName(n).run(spark, SharedSpark.sf).collect()

  private lazy val docs: Seq[(Long, String, String, String)] =
    Tables.df(spark, SharedSpark.sf, "documents")
      .select("doc_id", "text", "lang", "source").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))

  private def toks(text: String): Seq[String] =
    text.toLowerCase.split("\\s+", -1).filter(_.nonEmpty).toSeq

  test("p211: Good-Turing identities against a plain-Scala bigram table") {
    val rows = run("p211_good_turing_mass")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    // the bigram type space must populate the spectrum head somewhere —
    // the unigram version was vacuous (fixed small vocab, N1 = 0)
    assert(rows.exists(_._4 > 0), "no language has singleton bigrams")
    val byLang = docs.groupBy(_._3)
    rows.foreach { case (lang, n, v, n1, n2, mass, rstar) =>
      val tf = byLang(lang)
        .flatMap(d => d._2.toLowerCase.split("\\s+", -1).toSeq
          .sliding(2).filter(_.length == 2).map(_.mkString(" ")))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(n == tf.values.sum, s"$lang token total")
      assert(v == tf.size, s"$lang vocab")
      assert(n1 == tf.values.count(_ == 1L), s"$lang N1")
      assert(n2 == tf.values.count(_ == 2L), s"$lang N2")
      assert(math.abs(mass - n1.toDouble / n) < 1e-6, s"$lang missing mass")
      val want = if (n1 == 0) 0.0 else 2.0 * n2 / n1
      assert(math.abs(rstar - want) < 1e-6, s"$lang r*(1)")
      assert(mass >= 0 && mass <= 1)
    }
  }

  test("p212: Wilson LCB is below the rate, ranks are a permutation, formula matches") {
    val rows = run("p212_wilson_ranking")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5)))
    assert(rows.nonEmpty)
    assert(rows.map(_._6).sorted.toSeq == (1L to rows.length).toSeq,
      "ranks must be a permutation of 1..k")
    val z = 1.959963985
    rows.foreach { case (src, n, k, p, lcb, _) =>
      assert(k <= n && p == math.rint(k.toDouble / n * 1e6) / 1e6)
      assert(lcb <= p + 1e-9, s"$src: LCB above the rate")
      assert(lcb >= -1e-9, s"$src: negative LCB")
      val pr = k.toDouble / n
      val want = (pr + z * z / (2 * n) -
        z * math.sqrt(pr * (1 - pr) / n + z * z / (4.0 * n * n))) / (1 + z * z / n)
      assert(math.abs(lcb - want) < 1e-6, s"$src: formula drift")
    }
    // ranking order = lcb desc, source asc
    val sorted = rows.sortBy { case (src, _, _, _, lcb, _) => (-lcb, src) }
    assert(sorted.map(_._6).toSeq == (1L to rows.length).toSeq,
      "rank must follow (lcb desc, source)")
  }

  test("p213: HLL registers — exact side true, estimate inside sketch error") {
    val rows = run("p213_hll_sketch")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val byLang = docs.groupBy(_._3)
    rows.foreach { case (lang, exact, v0, est, relErr) =>
      assert(exact == byLang(lang).flatMap(d => toks(d._2)).distinct.size,
        s"$lang exact distinct")
      assert(v0 >= 0 && v0 <= 64)
      assert(est > 0)
      assert(math.abs(relErr - (est - exact) / exact) < 1e-4)
      // m=64 HLL has ~1.04/sqrt(64) = 13% standard error; allow 4 sigma
      assert(math.abs(relErr) < 0.52, s"$lang rel_err $relErr out of band")
    }
  }

  test("p214: McNemar cells account for every doc and chi2 matches") {
    val r = run("p214_mcnemar_langid").head
    val (n, bc, bw, aOnly, bOnly, chi2) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5))
    assert(n == bc + bw + aOnly + bOnly, "2x2 cells must partition the docs")
    assert(n == docs.count(d => toks(d._2).nonEmpty))
    // recompute from the raw predicates
    val stop = Set("the", "a", "of", "to", "and")
    var (wbc, wbw, wa, wb) = (0L, 0L, 0L, 0L)
    docs.foreach { case (_, text, lang, _) =>
      val ts = toks(text)
      if (ts.nonEmpty) {
        val actual = lang == "en"
        val aPred = 50L * ts.count(stop) >= ts.size
        val bPred = 10L * ts.map(_.length.toLong).sum < 46L * ts.size
        (aPred == actual, bPred == actual) match {
          case (true, true) => wbc += 1
          case (false, false) => wbw += 1
          case (true, false) => wa += 1
          case (false, true) => wb += 1
        }
      }
    }
    assert((bc, bw, aOnly, bOnly) == ((wbc, wbw, wa, wb)))
    val want = if (wa + wb == 0) 0.0
      else math.pow(math.max(math.abs(wa - wb) - 1, 0).toDouble, 2) / (wa + wb)
    assert(math.abs(chi2 - want) < 1e-6)
  }

  test("p215: ANOVA sums of squares are nonnegative and match a Scala recompute") {
    val r = run("p215_anova_f").head
    val (k, n, ssb, ssw, f) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(ssb >= -0.01 && ssw >= -0.01, "sums of squares nonnegative")
    val ev = Tables.df(spark, SharedSpark.sf, "events")
      .select("event_type", "value").collect()
      .map(x => (x.getString(0), BigDecimal(x.getDouble(1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val groups = ev.groupBy(_._1).values.toSeq
    assert(k == groups.size && n == ev.length)
    def d(x: BigDecimal) = x.toDouble
    val terms = groups.map { g =>
      val s = g.map(_._2).sum
      (g.size.toLong, s,
        BigDecimal(math.rint(d(s) * d(s) / g.size * 1e6) / 1e6))
    }
    val (sAll, ssAll, s2nAll) = (terms.map(_._2).sum,
      ev.map(x => x._2 * x._2).sum, terms.map(_._3).sum)
    val wantSsb = d(s2nAll) - d(sAll) * d(sAll) / n
    val wantSsw = d(ssAll) - d(s2nAll)
    assert(math.abs(ssb - math.rint(wantSsb * 100) / 100) < 0.02, "SSB")
    assert(math.abs(ssw - math.rint(wantSsw * 100) / 100) < 0.02, "SSW")
    val wantF = (wantSsb / (k - 1)) / (wantSsw / (n - k))
    assert(math.abs(f - wantF) < 1e-4, s"F $f vs $wantF")
  }

  test("p216: NDCG in (0,1], ideal dominates, brute-force agreement per term") {
    val rows = run("p216_ndcg_eval")
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == 6, "six probe terms")
    val disc = Map(1 -> 1.0, 2 -> 1.584962500721156, 3 -> 2.0,
      4 -> 2.321928094887362, 5 -> 2.584962500721156)
    val dls = docs.map(d => d._1 -> toks(d._2).size).toMap
    val avgdl = dls.values.sum.toDouble / dls.size
    rows.foreach { case (term, dcg, idcg, ndcg) =>
      assert(ndcg > 0 && ndcg <= 1 + 1e-9, s"$term ndcg $ndcg")
      assert(idcg >= dcg - 1e-9, s"$term ideal must dominate")
      // brute force: tf per doc, BM25-ish ranking, graded gains
      val tf = docs.map(d => d._1 -> toks(d._2).count(_ == term))
        .filter(_._2 > 0)
      val scored = tf.map { case (id, t) =>
        (id, math.min(t, 5),
          t * 2.2 / (t + 1.2 * (0.25 + 0.75 * dls(id) / avgdl)))
      }
      def dcgOf(ranked: Seq[(Long, Int)]): Double =
        ranked.take(5).zipWithIndex.map { case ((_, rel), i) =>
          math.rint(((1L << rel) - 1).toDouble / disc(i + 1) * 1e9) / 1e9
        }.sum
      val sys = dcgOf(scored.sortBy(x => (-x._3, x._1)).map(x => (x._1, x._2)))
      val ideal = dcgOf(scored.sortBy(x => (-x._2, x._1)).map(x => (x._1, x._2)))
      assert(math.abs(dcg - sys) < 1e-6, s"$term dcg $dcg vs $sys")
      assert(math.abs(idcg - ideal) < 1e-6, s"$term idcg")
      assert(math.abs(ndcg - sys / ideal) < 1e-5, s"$term ndcg")
    }
  }
}
