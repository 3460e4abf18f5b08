package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the batch-26 operators beyond the driver gate: RRF
  * fusion arithmetic and the KMV union's sketch-algebra identity.
  */
class PipelineBatch26Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  test("p102: ranks are contiguous, scores non-increasing, RRF bounds hold") {
    val rows = byName("p102_hybrid_rrf").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (qid, _, cid, rrf) =>
      assert(cid != qid, "a query retrieved itself")
      // max possible fused score is rank-1 in BOTH arms: 2/(60+1)
      assert(rrf > 0 && rrf <= 2.0 / 61 + 1e-9, s"rrf $rrf outside (0, 2/61]")
    }
    rows.groupBy(_._1).foreach { case (qid, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq,
        s"query $qid: ranks not contiguous from 1")
      sorted.map(_._4).zip(sorted.map(_._4).tail).foreach { case (a, b) =>
        assert(b <= a + 1e-9, s"query $qid: fused score increased with rank")
      }
      assert(sorted.map(_._3).distinct.length == sorted.length,
        s"query $qid: duplicate candidate")
    }
  }

  test("p103: union sketch equals the global sketch; estimates are calibrated") {
    val rows = byName("p103_kmv_union").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val (dUnion, estUnion, sumGain) = (rows.head._4, rows.head._5, rows.head._6)
    rows.foreach { case (_, de, est, du, eu, gain) =>
      // summary columns are constant across source rows
      assert(du == dUnion && eu == estUnion && gain == sumGain)
      // KMV at k=64 has σ ≈ 1/8; 4σ bounds on a real sketch
      assert(est > de * 0.5 && est < de * 1.7,
        s"per-source estimate $est far from exact $de")
    }
    assert(estUnion > dUnion * 0.5 && estUnion < dUnion * 1.7,
      s"union estimate $estUnion far from exact $dUnion")
    // union never exceeds the sum of parts; the gain is their difference
    assert(dUnion <= rows.map(_._2).sum)
    val sumEst = rows.map(r => BigDecimal(r._3)).sum.toDouble
    assert(math.abs((sumEst - estUnion) - sumGain) < 1e-3,
      "overlap_gain is not sum(est) - est_union")

    // sketch-algebra identity: the k smallest of the per-source k-minimum
    // sets equal the k-minimum set of the global gram stream
    val docs = Tables.df(spark, SharedSpark.sf, "documents")
      .select(col("source"), split(lower(col("text")), "\\s+").as("tk"))
      .filter(size(col("tk")) >= 3)
    val grams = docs.select(col("source"),
      explode(transform(sequence(lit(1L), (size(col("tk")) - 2).cast("long")),
        i => md5(concat_ws(" ", slice(col("tk"), i.cast("int"), lit(3)))))).as("g"))
      .distinct()
    val perSource = grams.groupBy(col("source"))
      .agg(Functions.kmvSketch(col("g")).as("sk"))
      .agg(slice(array_sort(array_distinct(flatten(collect_list(col("sk"))))), 1, 64))
      .head().getSeq[String](0)
    val global = grams.select(col("g")).distinct()
      .agg(Functions.kmvSketch(col("g"))).head().getSeq[String](0)
    assert(perSource == global,
      "union of per-source k-minimum sets != global k-minimum set")
  }
}
