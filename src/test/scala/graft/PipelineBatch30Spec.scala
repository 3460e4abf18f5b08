package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the batch-30 operators beyond the driver gate: fuzzy-match
  * scores respect the blocking contract, the DQ report's accounting holds,
  * shards partition the corpus, and purity is a well-formed majority share.
  */
class PipelineBatch30Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  test("p115: pairs are ordered, above threshold, and share a block prefix") {
    val rows = byName("p115_fuzzy_match").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty, "no fuzzy pairs at spec scale")
    rows.foreach { case (a, b, lev, sim) =>
      assert(a < b, s"pair ($a,$b) not ordered")
      assert(sim >= 0.8 - 1e-9 && sim <= 1.0 + 1e-9, s"($a,$b): sim $sim")
      assert(lev >= 0)
    }
    // symmetric ground truth: every reported pair's docs share the 3-token
    // prefix (the blocking key) — spot-check via the raw table
    val d = Tables.df(spark, SharedSpark.sf, "documents")
      .select(col("doc_id"), concat_ws(" ",
        slice(split(lower(col("text")), "\\s+"), 1, 3)).as("blk"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (a, b, _, _) =>
      assert(d(a) == d(b), s"pair ($a,$b) crosses blocks")
    }
  }

  test("p116: eight rules, rates consistent, known-violated rules fire") {
    val rows = byName("p116_dq_rules").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.length == 8)
    rows.foreach { case (rule, _, n, v, rate) =>
      assert(v >= 0 && v <= n, s"$rule: violations out of range")
      assert(math.abs(rate - v.toDouble / n) < 1e-6, s"$rule: rate off")
    }
    val byRule = rows.map(r => r._1 -> r._4).toMap
    assert(byRule("r01_customer_negative_acctbal") > 0, "TPC-H has negative balances")
    assert(byRule("r02_lineitem_discount_high") > 0, "TPC-H has >8% discounts")
    assert(byRule("r04_orders_orphan_custkey") == 0, "TPC-H integrity holds")
    assert(byRule("r05_orders_duplicate_pk") == 0, "order keys are unique")
  }

  test("p117: shards partition the corpus and stay reasonably balanced") {
    val rows = byName("p117_shard_manifest").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val n = Tables.df(spark, SharedSpark.sf, "documents").count()
    assert(rows.map(_._2).sum == n, "shards don't partition the corpus")
    assert(rows.forall(r => r._1 >= 0 && r._1 < 16))
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-3, "shares don't sum to 1")
    // md5-fraction sharding is near-uniform: no shard more than 4x the mean
    val mean = n.toDouble / rows.length
    assert(rows.forall(_._2 < 4 * mean), "a shard is pathologically hot")
  }

  test("p118: purity is the majority share and clusters cover all vectors") {
    val rows = byName("p118_cluster_purity").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty && rows.length <= 4)
    val nVecs = Tables.df(spark, SharedSpark.sf, "embeddings").count()
    assert(rows.map(_._2).sum == nVecs, "assignment doesn't cover all vectors")
    rows.foreach { case (cid, n, _, majN, purity) =>
      assert(majN <= n && majN >= 1, s"cluster $cid: majority count broken")
      assert(math.abs(purity - majN.toDouble / n) < 1e-6, s"cluster $cid: purity off")
      assert(purity >= 1.0 / 10 - 1e-6, s"cluster $cid: purity below chance floor")
    }
  }
}
