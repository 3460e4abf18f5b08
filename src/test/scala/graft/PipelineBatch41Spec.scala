package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.math.BigDecimal.RoundingMode

/** Batch-41 differentials: the Benford audit, the CUSUM scan, and the
  * pair-counting dedup evaluation each re-derived from scratch in plain
  * Scala (including the full MinHash signature pipeline for p151) and
  * compared cell-for-cell.
  */
class PipelineBatch41Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  private def rN(x: Double, n: Int): Double =
    BigDecimal(java.math.BigDecimal.valueOf(x)).setScale(n, RoundingMode.HALF_UP)
      .toDouble

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("p149: Benford table equals the from-scratch digit audit") {
    val vals = Tables.df(spark, SharedSpark.sf, "events")
      .select("value").collect().map(_.getDouble(0))
      .map(v => math.floor(math.abs(v)).toLong).filter(_ >= 1)
    val byDigit = vals.groupBy(_.toString.head.asDigit)
      .map { case (d, g) => d -> g.length.toLong }
    val t = vals.length.toLong
    val benford = Map(1 -> 0.301030, 2 -> 0.176091, 3 -> 0.124939,
      4 -> 0.096910, 5 -> 0.079181, 6 -> 0.066947, 7 -> 0.057992,
      8 -> 0.051153, 9 -> 0.045757)
    val expected = (1 to 9).map { d =>
      val n = byDigit.getOrElse(d, 0L)
      val obs = n.toDouble / t
      (d, n, rN(obs, 6), benford(d), rN(obs - benford(d), 6),
        rN((obs - benford(d)) * (obs - benford(d)) / benford(d), 9))
    }
    val got = byName("p149_benford_audit").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expected, s"Benford mismatch:\n got $got\nwant $expected")
  }

  test("p150: changepoint equals the from-scratch CUSUM scan") {
    val days = Tables.df(spark, SharedSpark.sf, "events")
      .selectExpr("CAST(CAST(ts AS DATE) AS STRING) AS d").collect()
      .map(_.getString(0))
    val counts = days.groupBy(identity).map { case (d, g) => d -> g.length.toLong }
      .toSeq.sortBy(_._1)
    val n = counts.length.toLong
    val total = counts.map(_._2).sum
    val mean = rN(total.toDouble / n, 6)
    val meanBd = BigDecimal(java.math.BigDecimal.valueOf(mean))
    var s = BigDecimal(0)
    val cusum = counts.map { case (d, c) => s += BigDecimal(c) - meanBd; d -> s }
    val (cpDay, peak) = cusum.map { case (d, v) => (d, v.abs.toDouble) }
      .sortBy { case (d, a) => (-a, d) }.head
    val row = byName("p150_cusum_changepoint").run(spark, SharedSpark.sf).head()
    assert(row.getLong(0) == n && row.getLong(1) == total)
    assert(row.getDouble(2) == mean)
    assert(row.getString(3) == cpDay, s"cp_day ${row.getString(3)} != $cpDay")
    assert(row.getDouble(4) == rN(peak, 6))
  }

  test("p151: pair-counting eval equals the from-scratch MinHash + digest fold") {
    val docs = Tables.df(spark, SharedSpark.sf, "documents")
      .select("text").collect().map(_.getString(0))
    val keyed = docs.flatMap { text =>
      val t = text.toLowerCase.split("\\s+", -1)
      if (t.length < 3) None
      else {
        val shingles = (0 to t.length - 3).map(i => t.slice(i, i + 3).mkString(" "))
          .distinct
        val sig = (0 until 8).map(h => shingles.map(sh => md5hex(s"$h:$sh")).min)
        Some((md5hex(sig.mkString("|")), md5hex(text.take(128))))
      }
    }
    def pairs(xs: Iterable[Long]): Long = xs.map(s => s * (s - 1) / 2).sum
    val tp = pairs(keyed.groupBy(identity).map(_._2.length.toLong))
    val pp = pairs(keyed.groupBy(_._1).map(_._2.length.toLong))
    val tpp = pairs(keyed.groupBy(_._2).map(_._2.length.toLong))
    val row = byName("p151_dedup_pair_eval").run(spark, SharedSpark.sf).head()
    assert(row.getLong(0) == keyed.length.toLong)
    assert((row.getLong(1), row.getLong(2), row.getLong(3)) == ((pp, tpp, tp)),
      s"pair masses ${(row.getLong(1), row.getLong(2), row.getLong(3))} != ${(pp, tpp, tp)}")
    if (pp > 0) assert(row.getDouble(4) == rN(tp.toDouble / pp, 6))
    if (tpp > 0) assert(row.getDouble(5) == rN(tp.toDouble / tpp, 6))
    if (pp + tpp > 0) assert(row.getDouble(6) == rN(2.0 * tp / (pp + tpp), 6))
    // the eval must be exercised: the synthetic corpus has true near-dup
    // structure, so truth pairs exist
    assert(tpp > 0, "test corpus must contain true duplicate pairs")
  }
}
