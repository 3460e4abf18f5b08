package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the batch-13 operators beyond the driver gate: ranking
  * sanity for TF-IDF, separation for the trained classifier, probability
  * conservation for the Markov matrix, stage monotonicity for curriculum
  * staging, the zh blind spot the langid audit exists to surface, and
  * PageRank mass/structure invariants.
  */
class PipelineBatch13Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  test("p61: ranks are 1..k per query, cosines in range and non-increasing, no self-match") {
    val rows = byName("p61_tfidf_topk").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      assert(rs.map(_._2).sorted.sameElements(1 to rs.length),
        s"$qid: ranks not contiguous from 1")
      assert(rs.forall(_._3 != qid), s"$qid: self-match leaked into neighbors")
      assert(rs.forall(r => r._4 >= -1e-9 && r._4 <= 1 + 1e-9),
        s"$qid: cosine outside [0,1]")
      val byRank = rs.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b - 1e-9 },
        s"$qid: cosines increase with rank")
    }
  }

  test("p62: trained one-vs-rest classifier ranks label 0 highest") {
    val rows = byName("p62_embed_logreg").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val corpusN = Tables.df(spark, SharedSpark.sf, "embeddings").count()
    assert(rows.map(_._2).sum == corpusN, "per-label counts do not cover the table")
    rows.foreach { case (lab, n, avgP, pred) =>
      assert(avgP > 0 && avgP < 1, s"label $lab: degenerate avg probability $avgP")
      assert(pred >= 0 && pred <= n, s"label $lab: n_pred_pos outside [0, n]")
    }
    // separation: after 5 balanced-gradient iterations the positive class
    // (label 0) must have the strictly highest mean score, with margin
    val p0 = rows.find(_._1 == 0).get._3
    val bestOther = rows.filter(_._1 != 0).map(_._3).max
    assert(p0 > bestOther + 0.01,
      f"no separation: avg p(label0)=$p0%.4f vs best other=$bestOther%.4f")
  }

  test("p63: per-prev transition probabilities conserve to 1") {
    val rows = byName("p63_markov_transitions").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (prev, rs) =>
      val mass = rs.map(_._4).sum
      assert(math.abs(mass - 1.0) < 1e-3,
        f"$prev: outgoing probabilities sum to $mass%.5f")
      assert(rs.forall(_._3 > 0), s"$prev: zero-count transition row emitted")
    }
    // every (user) sequence of length L contributes L-1 transitions
    val ev = Tables.df(spark, SharedSpark.sf, "events")
    val expected = ev.count() - ev.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(rows.map(_._3).sum == expected,
      "transition count is not sum over users of (len - 1)")
  }

  test("p64: stages partition the corpus with monotone score bands") {
    val rows = byName("p64_curriculum_stages").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    val corpusN = Tables.df(spark, SharedSpark.sf, "documents").count()
    assert(rows.map(_._2).sum == corpusN, "stages do not partition the corpus")
    assert(rows.map(_._1).forall(s => s >= 0 && s <= 3), "stage outside 0..3")
    rows.foreach { case (st, n, tok, lo, hi) =>
      assert(n > 0 && tok > 0, s"stage $st empty")
      assert(lo <= hi, s"stage $st: sc_min > sc_max")
    }
    rows.zip(rows.tail).foreach { case ((s1, _, _, _, hi1), (s2, _, _, lo2, _)) =>
      assert(hi1 <= lo2 + 1e-9, s"stage $s1 overlaps stage $s2 in score space")
    }
  }

  test("p65: confusion rows reconcile and expose the zh blind spot") {
    val rows = byName("p65_langid_eval").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        r.getDouble(6),
        if (r.isNullAt(7)) None else Some(r.getDouble(7))))
    val corpusN = Tables.df(spark, SharedSpark.sf, "documents").count()
    assert(rows.map(_._2).sum == corpusN)
    rows.foreach { case (lang, n, tp, fp, fn, prec, recall, _) =>
      assert(tp + fn == n, s"$lang: tp+fn != n_docs")
      assert(fp >= 0, s"$lang: negative fp")
      assert(recall >= 0 && recall <= 1, s"$lang: recall outside [0,1]")
      prec.foreach(p => assert(p >= 0 && p <= 1, s"$lang: precision outside [0,1]"))
    }
    // predicted totals (tp+fp) conserve the corpus too: every doc gets one prediction
    assert(rows.map(r => r._3 + r._4).sum == corpusN, "predictions do not cover the corpus")
    val zh = rows.find(_._1 == "zh")
    zh.foreach { z =>
      assert(z._3 == 0 && z._7 == 0.0, "zh has no rule — recall must be exactly 0")
      assert(z._6.isEmpty && z._8.isEmpty, "zh is never predicted — precision/F1 must be NULL")
    }
    val en = rows.find(_._1 == "en").get
    assert(en._7 > 0.5, "en default rule should give en high recall on this corpus")
  }

  test("p66: top-20 ranks are positive, distinct, non-increasing, above the teleport floor") {
    val out = byName("p66_pagerank").run(spark, SharedSpark.sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.length == 20)
    assert(out.map(_._1).distinct.length == 20, "duplicate doc in top-20")
    val n = Tables.df(spark, SharedSpark.sf, "documents").count().toDouble
    val floor = 0.15 / n
    out.foreach { case (v, pr) =>
      assert(pr >= floor - 1e-9, s"$v: rank below the teleport floor")
      assert(pr < 1.0, s"$v: rank not a probability")
    }
    assert(out.map(_._2).zip(out.map(_._2).tail).forall { case (a, b) => a >= b },
      "output not ordered by rank desc")
    // determinism: a second run is bit-identical (decimal-summed contributions)
    val again = byName("p66_pagerank").run(spark, SharedSpark.sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.sameElements(again), "PageRank output not deterministic across runs")
  }
}
