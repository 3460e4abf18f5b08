package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.math.BigDecimal.RoundingMode

/** Batch-37 differentials: chi-squared, Welch t, and the BH screen each
  * re-derived from scratch in plain Scala with the same rounding discipline
  * and compared cell-for-cell, plus the BH step-up contract (the rejected
  * set is exactly ranks 1..k for the largest k with p_k <= k/m*alpha).
  */
class PipelineBatch37Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  private val EnStops = Set("the", "of", "and", "to", "a", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by")

  private def rN(x: Double, n: Int): Double =
    BigDecimal(java.math.BigDecimal.valueOf(x)).setScale(n, RoundingMode.HALF_UP)
      .toDouble

  private def bd(x: Double): BigDecimal =
    BigDecimal(java.math.BigDecimal.valueOf(x))

  private def docs(): Array[(String, String, Array[String])] =
    Tables.df(spark, SharedSpark.sf, "documents")
      .select("lang", "source", "text").collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getString(2).toLowerCase.split("\\s+", -1)))

  private def enRatio(ws: Array[String]): Double =
    rN(ws.count(EnStops.contains).toDouble / ws.length, 6)

  test("p137: chi-squared equals the from-scratch contingency computation") {
    val d = docs()
    val obs = d.groupBy(x => (x._2, x._1)).map { case (k, g) => k -> g.length.toLong }
    val rTot = d.groupBy(_._2).map { case (s, g) => s -> g.length.toLong }
    val cTot = d.groupBy(_._1).map { case (l, g) => l -> g.length.toLong }
    val n = d.length.toLong
    // .toSeq: a for over Map.keys yields a SET, which would dedup equal terms
    val chi2raw = (for (s <- rTot.keys.toSeq; l <- cTot.keys.toSeq) yield {
      val o = obs.getOrElse((s, l), 0L).toDouble
      val e = rTot(s).toDouble * cTot(l) / n
      bd(rN((o - e) * (o - e) / e, 9))
    }).sum.toDouble
    val row = byName("p137_chi2_independence").run(spark, SharedSpark.sf).head()
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == (rTot.size - 1).toLong * (cTot.size - 1))
    assert(row.getDouble(2) == rN(chi2raw, 6), s"chi2 ${row.getDouble(2)}")
    val mindim = math.min(rTot.size - 1, cTot.size - 1)
    assert(row.getDouble(3) == rN(math.sqrt(chi2raw / (n * mindim)), 6))
  }

  test("p138: Welch t and df equal the from-scratch sufficient-sum computation") {
    val d = docs()
    def stats(grp: Int): (Long, Double, Double) = {
      val xs = d.filter(_._2.drop(3).toInt % 2 == grp).map(x => enRatio(x._3))
      val n = xs.length.toLong
      val sx = xs.map(bd).sum.toDouble
      val sxx = xs.map(x => bd(rN(x * x, 12))).sum.toDouble
      val m = rN(sx / n, 6)
      val v = rN((sxx - sx * sx / n) / (n - 1), 12)
      (n, m, v)
    }
    val (n0, m0, v0) = stats(0)
    val (n1, m1, v1) = stats(1)
    val se2 = v0 / n0 + v1 / n1
    val row = byName("p138_welch_ttest").run(spark, SharedSpark.sf).head()
    assert((row.getLong(0), row.getLong(1)) == ((n0, n1)))
    assert((row.getDouble(2), row.getDouble(3)) == ((m0, m1)))
    assert(row.getDouble(4) == rN((m0 - m1) / math.sqrt(se2), 6))
    assert(row.getDouble(5) == rN(se2 * se2 /
      ((v0 / n0) * (v0 / n0) / (n0 - 1) + (v1 / n1) * (v1 / n1) / (n1 - 1)), 6))
  }

  test("p139: the BH screen equals the from-scratch step-up") {
    val d = docs()
    val xs = d.map(x => x._2 -> enRatio(x._3))
    val n = xs.length.toLong
    val sx = xs.map(x => bd(x._2)).sum.toDouble
    val sxx = xs.map(x => bd(rN(x._2 * x._2, 12))).sum.toDouble
    val pm = rN(sx / n, 6)
    val pv = rN((sxx - sx * sx / n) / (n - 1), 12)
    val per = xs.groupBy(_._1).map { case (s, g) =>
      val mG = rN(g.map(x => bd(x._2)).sum.toDouble / g.length, 6)
      val z = rN((mG - pm) / math.sqrt(pv / g.length), 6)
      (s, g.length.toLong, z, rN(math.min(1.0, 1.0 / (z * z)), 6))
    }.toSeq
    val ranked = per.sortBy(x => (x._4, x._1)).zipWithIndex
      .map { case ((s, ng, z, p), i) => (s, ng, z, p, i + 1L) }
    val m = ranked.length
    val k = ranked.filter { case (_, _, _, p, r) => p <= r.toDouble / m * 0.10 }
      .map(_._5).reduceOption(_ max _).getOrElse(0L)
    val expected = ranked.map { case (s, ng, z, p, r) =>
      (s, ng, z, p, r, rN(r.toDouble / m * 0.10, 6), if (r <= k) 1 else 0)
    }
    val got = byName("p139_bh_fdr").run(spark, SharedSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5), r.getInt(6))).toSeq
    assert(got == expected, s"BH table mismatch:\n got $got\nwant $expected")
    // step-up contract: rejections are exactly the prefix 1..k
    val rej = got.filter(_._7 == 1).map(_._5)
    assert(rej == (1L to k), s"rejected ranks $rej != prefix 1..$k")
  }
}
