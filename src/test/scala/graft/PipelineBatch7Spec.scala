package graft

import org.scalatest.funsuite.AnyFunSuite

/** Properties of the batch-7 pipeline operators beyond the driver gate:
  * KMV estimator accuracy and structure, token-budget greedy feasibility,
  * BPE pair-count ranking shape, and OOV-rate bounds.
  */
class PipelineBatch7Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  test("p38: KMV estimate is positive and within sketch error of the exact count") {
    val rows = byName("p38_kmv_distinct").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, dExact, est, errPct) =>
      // k=64 => relative standard error ~ 1/sqrt(62) ~ 12.7%; 4 sigma bound.
      assert(dExact > 64, s"$src: exact distinct $dExact not > k — sketch degenerate")
      assert(est > 0.0, s"$src: non-positive estimate")
      assert(math.abs(errPct) < 51.0,
        s"$src: |err| ${errPct}% exceeds 4x the k=64 sketch RSE")
      // err_pct is derived from est and d_exact; check self-consistency at
      // the rounding grid.
      assert(math.abs(errPct - 100.0 * (est - dExact) / dExact) < 0.05,
        s"$src: err_pct inconsistent with est/d_exact")
    }
  }

  test("p39: selection is feasible (within budget) and non-trivial per source") {
    val rows = byName("p39_token_budget").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, nDocs, kept, keptTok) =>
      assert(kept >= 1 && kept <= nDocs, s"$src: kept_docs $kept out of [1,$nDocs]")
      assert(keptTok >= 1 && keptTok <= 800L,
        s"$src: kept_tokens $keptTok outside (0, budget]")
    }
  }

  test("p40: ranks contiguous, counts non-increasing, pairs are 2 chars") {
    val rows = byName("p40_bpe_pairs").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq, "ranks not contiguous")
    val cnts = rows.map(_._3)
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b },
      s"pair counts increase along ranks: ${cnts.toSeq}")
    assert(rows.forall(_._2.length == 2), "a merge candidate is not a character pair")
    assert(rows.forall(_._3 > 0))
  }

  test("p41: kept_docs bounded by docs and avg_oov in (0,1)") {
    val rows = byName("p41_vocab_prune").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, docs, kept, avg) =>
      assert(kept >= 0 && kept <= docs, s"$lang: kept $kept out of [0,$docs]")
      assert(avg > 0.0 && avg < 1.0, s"$lang: avg_oov $avg outside (0,1)")
    }
  }

  test("p42: every source fits a negative slope with positive intercept") {
    val rows = byName("p42_zipf_slope").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, nVocab, slope, intercept) =>
      assert(nVocab > 1, s"$src: vocabulary too small for a fit")
      // frequency is non-increasing along rank by construction => OLS slope
      // on the log-log curve cannot be positive
      assert(slope <= 0.0, s"$src: positive Zipf slope $slope")
      // intercept approximates ln(top frequency) > 0 for any real corpus
      assert(intercept > 0.0, s"$src: non-positive intercept $intercept")
    }
  }

  test("p43: per-label cohesion stats are valid cosines and cover all vectors") {
    val out = byName("p43_label_centroids").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.nonEmpty)
    val total = Tables.df(spark, SharedSpark.sf, "embeddings").count()
    assert(out.map(_._2).sum == total, "centroid stats do not cover every vector")
    out.foreach { case (label, n, avg, min) =>
      assert(n > 0)
      assert(min >= -1.0 - 1e-9 && min <= 1.0 + 1e-9, s"label $label: min_cos $min")
      assert(avg >= min, s"label $label: avg_cos $avg below min_cos $min")
      assert(avg <= 1.0 + 1e-9, s"label $label: avg_cos $avg above 1")
    }
  }

  test("p44: splits partition the corpus and no source straddles splits") {
    val rows = byName("p44_leakage_safe_split").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = Tables.df(spark, SharedSpark.sf, "documents")
    val totalDocs = docs.count()
    val totalSources = docs.select("source").distinct().count()
    assert(rows.map(_._3).sum == totalDocs, "splits do not partition documents")
    // sum of per-split distinct sources == global distinct sources <=> no
    // source appears in two splits (assignment is a function of source)
    assert(rows.map(_._2).sum == totalSources,
      s"a source straddles splits: ${rows.toSeq}")
    assert(rows.map(_._1).toSet.subsetOf(Set("train", "val", "test")))
    assert(rows.find(_._1 == "train").exists(_._3 > 0), "empty train split")
  }

  test("p45: KL divergences are non-negative and finite") {
    val rows = byName("p45_vocab_kl").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, nVocab, kl) =>
      assert(nVocab > 0)
      // Gibbs' inequality modulo the 1e-9 summation grid
      assert(kl >= -1e-5, s"$src: negative KL $kl")
      assert(!kl.isNaN && !kl.isInfinite, s"$src: non-finite KL")
      assert(kl < 10.0, s"$src: implausibly large KL $kl for a shared vocabulary")
    }
  }
}
