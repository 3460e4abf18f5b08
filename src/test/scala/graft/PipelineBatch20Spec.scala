package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the batch-20 operators beyond the driver gate: monotone
  * risk accounting for k-anonymity, conservation + exact bucketing for the
  * skew profile, and spectrum arithmetic for dup families.
  */
class PipelineBatch20Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  test("p89: risk is monotone in k and bounded by the group ledger") {
    val rows = byName("p89_k_anonymity").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(2, 5, 10, 20))
    // same grouping → same group count on every row
    assert(rows.map(_._2).distinct.length == 1)
    rows.foreach { case (k, groups, below, atRisk, share) =>
      assert(below <= groups, s"k=$k: more below-k groups than groups")
      assert(atRisk <= below * (k - 1), s"k=$k: at-risk rows exceed (k-1) per group")
      assert(atRisk >= below, s"k=$k: below-k groups must carry >=1 row each")
      assert(share >= 0 && share <= 1)
    }
    rows.zip(rows.tail).foreach { case ((k1, _, b1, r1, s1), (k2, _, b2, r2, s2)) =>
      assert(b2 >= b1 && r2 >= r1 && s2 >= s1 - 1e-9,
        s"risk not monotone from k=$k1 to k=$k2")
    }
  }

  test("p90: buckets conserve keys/rows and the bit-length bucketing is exact") {
    val rows = byName("p90_join_key_skew").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val ev = Tables.df(spark, SharedSpark.sf, "events")
    val agg = ev.agg(count(lit(1)), countDistinct(col("user_id"))).head()
    assert(rows.map(_._3).sum == agg.getLong(0), "bucket rows do not sum to events")
    assert(rows.map(_._2).sum == agg.getLong(1), "bucket keys do not sum to users")
    rows.foreach { case (b, nKeys, nRows, skew) =>
      // every key in bucket b has frequency in [2^b, 2^(b+1))
      assert(nRows >= nKeys * (1L << b) && nRows < nKeys * (1L << (b + 1)),
        s"bucket $b: aggregate row count outside its frequency band")
      assert(skew >= 1.0 - 1e-9, "skew factor below 1 is impossible")
    }
    assert(rows.map(_._4).distinct.length == 1, "global skew factor must be constant")
  }

  test("p91: the spectrum's arithmetic identities hold and cover the corpus") {
    val rows = byName("p91_dup_size_spectrum").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val corpusN = Tables.df(spark, SharedSpark.sf, "documents").count()
    assert(rows.map(_._3).sum == corpusN, "spectrum docs do not sum to the corpus")
    rows.foreach { case (size, fams, docs, removable) =>
      assert(docs == size * fams && removable == (size - 1) * fams,
        s"size $size: spectrum arithmetic broken")
    }
    // removable = corpus - distinct contents
    val distinctContents = Tables.df(spark, SharedSpark.sf, "documents")
      .select(countDistinct(md5(col("text")))).head().getLong(0)
    assert(rows.map(_._4).sum == corpusN - distinctContents)
  }
}
