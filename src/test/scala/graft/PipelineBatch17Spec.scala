package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the batch-17 operators beyond the driver gate:
  * distribution laws for temperature sampling, monotonicity of the dedup
  * threshold sweep, decay-weight bounds for engagement scoring, gram-count
  * conservation for distinct-n, and cumulativity of the vocab curve.
  */
class PipelineBatch17Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  test("p79: each temperature's sampling probabilities form a flatter distribution") {
    val rows = byName("p79_lang_temperature").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    // shares and each p_α column are (rounded) distributions
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3, "shares do not sum to 1")
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-3, "p_a0 does not sum to 1")
    assert(math.abs(rows.map(_._6).sum - 1.0) < 1e-3, "p_a1 does not sum to 1")
    // temperature flattening: α=0.3 is flatter than α=0.7 is flatter than raw —
    // max probability shrinks as α drops
    assert(rows.map(_._4).max <= rows.map(_._6).max + 1e-9)
    assert(rows.map(_._6).max <= rows.map(_._3).max + 1e-9)
    // boosts upsample below-average languages, downsample above-average ones
    rows.foreach { case (lang, _, share, _, b0, _, b1) =>
      val mean = 1.0 / rows.length
      if (share < mean * 0.5) {
        assert(b0 > 1.0, s"$lang: low-resource language not upsampled at alpha=0.3")
        assert(b0 >= b1 - 1e-9, s"$lang: lower temperature should boost more")
      }
      if (share > mean * 2.0)
        assert(b0 < 1.0, s"$lang: high-resource language not downsampled")
    }
  }

  test("p80: the retention curve is monotone in the threshold") {
    val rows = byName("p80_dedup_threshold_sweep").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.map(_._1) sameElements Array(0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8))
    rows.zip(rows.tail).foreach { case ((t1, p1, d1), (t2, p2, d2)) =>
      assert(p2 <= p1, s"pairs increased from threshold $t1 to $t2")
      assert(d2 <= d1, s"affected docs increased from threshold $t1 to $t2")
    }
    rows.foreach { case (t, pairs, docs) =>
      assert(docs <= 2 * pairs, s"t=$t: more affected docs than pair endpoints")
      if (pairs > 0) assert(docs >= 2, s"t=$t: pairs exist but <2 docs affected")
    }
    assert(rows.head._2 > 0, "sweep found no candidate pairs at the loosest threshold")
  }

  test("p81: decay weights bound each user's score by its undecayed magnitude") {
    val rows = byName("p81_decay_engagement").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ev = Tables.df(spark, SharedSpark.sf, "events")
    val (nUsers, nEvents) = {
      val r = ev.agg(countDistinct(col("user_id")), count(lit(1))).head()
      (r.getLong(0), r.getLong(1))
    }
    assert(rows.length == nUsers, "one row per user expected")
    assert(rows.map(_._2).sum == nEvents, "event counts do not partition the stream")
    val caps = ev.groupBy(col("user_id"))
      .agg(sum(abs(col("value"))).as("cap"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (u, _, dv) =>
      assert(math.abs(dv) <= caps(u) + 1e-6,
        s"user $u: decayed score exceeds undecayed magnitude (weights must be <=1)")
    }
  }

  test("p82: gram counts conserve (bigrams = unigrams - docs) and ratios are sane") {
    val rows = byName("p82_distinct_ngrams").run(spark, SharedSpark.sf)
      .collect().map(r => ((r.getString(0), r.getInt(1)), (r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    val docsPerSource = Tables.df(spark, SharedSpark.sf, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keys.map(_._1).toSet == docsPerSource.keySet)
    docsPerSource.foreach { case (src, nDocs) =>
      val (uniTotal, uniDistinct, uniRatio) = rows((src, 1))
      val (biTotal, biDistinct, biRatio) = rows((src, 2))
      // each doc with k tokens yields k unigrams and k-1 bigrams
      assert(biTotal == uniTotal - nDocs, s"$src: bigram count violates token arithmetic")
      assert(uniDistinct <= uniTotal && biDistinct <= biTotal)
      Seq(uniRatio, biRatio).foreach(x => assert(x > 0 && x <= 1))
      // bigrams are strictly more diverse than unigrams on natural-ish text
      assert(biRatio >= uniRatio, s"$src: bigram diversity below unigram diversity")
    }
  }

  test("p83: the vocab curve cumulates to the corpus's distinct shingle count") {
    val rows = byName("p83_vocab_growth").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0 until 10), "expected exactly deciles 0..9")
    // cum_vocab is the running sum of new_shingles
    rows.foldLeft(0L) { case (acc, (d, fresh, cum)) =>
      assert(cum == acc + fresh, s"decile $d: cumulative count broken")
      cum
    }
    // every decile contributes something on this corpus, and the first
    // decile dominates later ones (Heaps-law concavity, loosely)
    assert(rows.forall(_._2 > 0), "a decile contributed zero new shingles")
    assert(rows.head._2 > rows.last._2,
      "vocabulary growth did not slow across the corpus")
  }
}
