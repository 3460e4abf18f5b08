package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.IvfIndex

/** The trained-quantizer IVF path (SURVEY.md §6 ANN scale design): k-means
  * centroids must plug into the same probed-rerank plan as the first-16
  * quantizer, and training must buy recall, not lose it. Recall is measured
  * against the exact brute-force top-k — the ground truth an ANN index
  * approximates.
  */
class IvfIndexSpec extends AnyFunSuite {
  private val spark = SharedSpark.spark
  private val e = Tables.df(spark, SharedSpark.sf, "embeddings").cache()

  private val K = 8
  private val TOPK = 5
  private val QUERIES = 10

  private def bruteTopK: Set[(Long, Long)] = {
    val q = e.filter(col("vec_id") < QUERIES)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
    val n = e.select(col("vec_id").as("n_id"), col("embedding").as("nvec"))
    val cos = Functions.cosineSimilarity(col("qvec"), col("nvec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(cos.desc, col("n_id"))
    broadcast(q).crossJoin(n).filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), row_number().over(w).as("rn"))
      .filter(col("rn") <= TOPK)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def recallOf(cents: DataFrame): Double = {
    val got = IvfIndex.ivfTopK(e, cents, col("vec_id") < QUERIES, probes = 3, topK = TOPK)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = bruteTopK
    got.intersect(truth).size.toDouble / truth.size
  }

  test("k-means training yields k centroids of the embedding dimensionality") {
    val dim = e.select(size(col("embedding"))).head().getInt(0)
    val cents = IvfIndex.trainCentroids(e, K, maxIter = 5, seed = 42L)
    assert(cents.length == K)
    assert(cents.forall(_._2.length == dim))
    assert(cents.map(_._1).toSet == (0 until K).toSet)
  }

  test("training is deterministic under a fixed seed") {
    val a = IvfIndex.trainCentroids(e, K, maxIter = 3, seed = 7L)
    val b = IvfIndex.trainCentroids(e, K, maxIter = 3, seed = 7L)
    assert(a.map(_._2.toSeq) sameElements b.map(_._2.toSeq))
  }

  /** The synthetic embeddings are uniform-random (no cluster structure), so
    * recall/balance deltas vs the first-k quantizer are noise, not
    * invariants. What Lloyd's provably optimizes on ANY distribution is the
    * quantization error — within-cluster sum of squared distances. Assert
    * trained centroids quantize strictly better than k arbitrary data
    * points, plus sane end-to-end recall (deterministic under the seed). */
  test("trained centroids quantize better (lower WCSS) and keep sane recall") {
    val naive = e.filter(col("vec_id") < K)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    val trained = IvfIndex.centroidsDf(spark,
      IvfIndex.trainCentroids(e, K, maxIter = 5, seed = 42L))
    def wcss(cents: DataFrame): Double = {
      val sq = aggregate(
        zip_with(col("embedding").cast("array<double>"),
          col("cvec").cast("array<double>"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v)
      e.crossJoin(broadcast(cents))
        .groupBy(col("vec_id")).agg(min(sq).as("d2"))
        .agg(sum(col("d2"))).head().getDouble(0)
    }
    val naiveCost = wcss(naive)
    val trainedCost = wcss(trained)
    assert(trainedCost < naiveCost,
      s"trained WCSS $trainedCost not below quantizer WCSS $naiveCost")
    assert(recallOf(trained) >= 0.3)
  }

  test("p15 flag path: trained-quantizer plan returns topK rows per query") {
    val trained = IvfIndex.centroidsDf(spark,
      IvfIndex.trainCentroids(e, K, maxIter = 5, seed = 42L))
    val out = IvfIndex.ivfTopK(e, trained, col("vec_id") < 3, probes = 2, topK = TOPK)
      .groupBy(col("q_id")).agg(count(lit(1)).as("n"))
      .collect()
    assert(out.length == 3)
    assert(out.forall(_.getLong(1) <= TOPK))
    assert(out.forall(_.getLong(1) > 0))
  }
}
