package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the batch-18 operators beyond the driver gate: split
  * asymmetry for incremental dedup, decile partitioning for the quality
  * ensemble, and moment-law checks for embedding dimension stats.
  */
class PipelineBatch18Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  test("p84: every incoming doc gets a verdict, and verdicts are consistent") {
    val rows = byName("p84_incremental_minhash").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getBoolean(3)))
    val expected = Tables.df(spark, SharedSpark.sf, "documents")
      .filter(col("doc_id") % 10 >= 8).count()
    assert(rows.length == expected, "a new-shard doc is missing its verdict row")
    rows.foreach { case (id, nCand, bestJ, isDup) =>
      assert(id % 10 >= 8, s"doc $id is not in the incoming shard")
      if (nCand == 0) {
        assert(bestJ.isEmpty && !isDup, s"doc $id: clean doc carries similarity state")
      } else {
        assert(bestJ.exists(j => j >= 0 && j <= 1), s"doc $id: best_j outside [0,1]")
        assert(isDup == bestJ.exists(_ >= 0.5), s"doc $id: verdict contradicts best_j")
      }
    }
    // the synthetic corpus has near-dups crossing any 80/20 split
    assert(rows.exists(_._4), "incremental screen found no duplicates at all")
    assert(rows.exists(!_._4), "incremental screen dropped everything")
  }

  test("p85: deciles partition the corpus and scores rank correctly across deciles") {
    val rows = byName("p85_quality_ensemble").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val corpusN = Tables.df(spark, SharedSpark.sf, "documents").count()
    assert(rows.map(_._3).sum == corpusN, "deciles do not partition the corpus")
    rows.foreach { case (lang, d, n, sumScore) =>
      assert(d >= 1 && d <= 10, s"$lang: decile $d out of range")
      assert(n > 0 && sumScore >= 0)
    }
    // average score per decile (across langs) must be nondecreasing in decile
    val byDecile = rows.groupBy(_._2).map { case (d, g) =>
      d -> g.map(_._4).sum / g.map(_._3).sum
    }.toSeq.sortBy(_._1)
    byDecile.zip(byDecile.tail).foreach { case ((d1, a1), (d2, a2)) =>
      assert(a2 >= a1 - 1e-9, s"decile $d2 mean score below decile $d1")
    }
  }

  test("p86: one row per dimension with variance consistent with extrema") {
    val rows = byName("p86_embed_dim_stats").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq.sorted == (1 to 64), "expected dims 1..64")
    rows.foreach { case (d, mean, variance, mn, mx) =>
      assert(mn <= mean + 1e-6 && mean <= mx + 1e-6, s"dim $d: mean outside extrema")
      assert(variance >= 0, s"dim $d: negative variance")
      // Popoviciu bound: var <= (max-min)^2 / 4
      assert(variance <= (mx - mn) * (mx - mn) / 4 + 1e-6,
        s"dim $d: variance violates Popoviciu bound")
    }
    assert(rows.exists(_._3 < 0) || rows.exists(_._5 > 0),
      "embedding values all zero — stats suspect")
  }
}
