package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.math.BigDecimal.RoundingMode

/** Batch-39 differentials: the Hamilton apportionment, the deterministic
  * Laplace release, and the l-diversity screen each re-derived from scratch
  * in plain Scala and compared cell-for-cell, plus the apportionment
  * contract (quotas sum EXACTLY to the release size, each within 1 of its
  * floor).
  */
class PipelineBatch39Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  private def rN(x: Double, n: Int): Double =
    BigDecimal(java.math.BigDecimal.valueOf(x)).setScale(n, RoundingMode.HALF_UP)
      .toDouble

  private def bd(x: Double): BigDecimal =
    BigDecimal(java.math.BigDecimal.valueOf(x))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("p143: quotas equal the from-scratch Hamilton apportionment and sum to the release") {
    val counts = Tables.df(spark, SharedSpark.sf, "documents")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val wt = counts.map { case (s, n) => s -> rN(math.sqrt(n.toDouble), 6) }
    val t = wt.values.map(bd).sum.toDouble
    val ideal = wt.map { case (s, w) => s -> rN(w / t * 10000L, 6) }
    val base = ideal.map { case (s, i) => s -> math.floor(i).toLong }
    val rem = ideal.map { case (s, i) => s -> rN(i - math.floor(i), 6) }
    val k = 10000L - base.values.sum
    val pri = rem.toSeq.sortBy { case (s, r) => (-r, s) }.map(_._1).zipWithIndex
      .map { case (s, i) => s -> (i + 1L) }.toMap
    val expected = counts.keys.toSeq.sorted.map { s =>
      (s, counts(s), wt(s), ideal(s), base(s),
        base(s) + (if (pri(s) <= k) 1L else 0L))
    }
    val got = byName("p143_quota_apportionment").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected, s"apportionment mismatch:\n got $got\nwant $expected")
    assert(got.map(_._6).sum == 10000L, "quotas must sum exactly to the release")
    got.foreach { case (_, _, _, _, b, q) => assert(q == b || q == b + 1) }
  }

  test("p144: noisy counts equal the from-scratch deterministic Laplace draw") {
    val counts = Tables.df(spark, SharedSpark.sf, "documents")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = counts.keys.toSeq.sorted.map { s =>
      val u = java.lang.Long.parseLong(md5hex(s + "_dp").take(8), 16) /
        4294967296.0
      val noise = rN(if (u < 0.5) math.log(2 * u) else -math.log(2 * (1 - u)), 6)
      (s, counts(s), rN(counts(s) + noise, 6), rN(math.abs(noise), 6))
    }
    val got = byName("p144_dp_noisy_counts").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(got == expected, s"DP release mismatch:\n got $got\nwant $expected")
    // both noise signs must occur across 20 cells (sanity of the inverse CDF)
    assert(got.exists(x => x._3 < x._2) && got.exists(x => x._3 > x._2))
  }

  test("p145: l-diversity screen equals the from-scratch entropy computation") {
    val cells = Tables.df(spark, SharedSpark.sf, "events")
      .selectExpr("event_type", "CAST(ts AS DATE) AS d",
        "CAST(floor(value / 10) AS BIGINT) AS vb", "user_id").collect()
      .map(r => ((r.getString(0), r.getDate(1).toString, r.getLong(2)),
        r.getLong(3)))
    val groups = cells.groupBy(_._1).map { case (_, rows) =>
      val byUser = rows.groupBy(_._2).map(_._2.length.toLong)
      val nRows = byUser.sum
      val h = byUser.map { c =>
        val p = c.toDouble / nRows
        bd(rN(-p * math.log(p), 9))
      }.sum.toDouble
      (byUser.size.toLong, nRows, rN(math.exp(h), 6))
    }.toSeq
    val expected = Seq(2, 3, 5).map { l =>
      (l, groups.length.toLong,
        groups.count(_._1 < l).toLong,
        groups.count(_._3 < l).toLong,
        rN(groups.filter(_._1 < l).map(_._2).sum.toDouble /
          groups.map(_._2).sum, 6))
    }
    val got = byName("p145_l_diversity").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got == expected, s"l-diversity mismatch:\n got $got\nwant $expected")
  }
}
