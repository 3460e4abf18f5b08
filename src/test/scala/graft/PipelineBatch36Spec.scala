package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.math.BigDecimal.RoundingMode

/** Batch-36 differentials: each op is re-derived from scratch in plain Scala
  * (same rounding conventions) and compared cell-for-cell — the fairness
  * table, every Poisson-bootstrap output field, and the MI top-20.
  */
class PipelineBatch36Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  private val EnStops = Set("the", "of", "and", "to", "a", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by")

  private def rN(x: Double, n: Int): Double =
    BigDecimal(java.math.BigDecimal.valueOf(x)).setScale(n, RoundingMode.HALF_UP)
      .toDouble

  private def docs(): Array[(Long, String, String, Array[String])] =
    Tables.df(spark, SharedSpark.sf, "documents")
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3).toLowerCase.split("\\s+", -1)))

  private def enRatio(ws: Array[String]): Double =
    rN(ws.count(EnStops.contains).toDouble / ws.length, 6)

  test("p134: fairness table equals the from-scratch per-source audit") {
    val d = docs()
    val pooledSel = rN(d.count(x => enRatio(x._4) >= 0.0625).toDouble / d.length, 6)
    val pos = d.filter(_._2 == "en")
    val pooledTpr = rN(pos.count(x => enRatio(x._4) >= 0.0625).toDouble / pos.length, 6)
    val got = byName("p134_fairness_audit").run(spark, SharedSpark.sf).collect()
    assert(got.map(_.getString(0)).toSeq == d.map(_._3).distinct.sorted.toSeq)
    got.foreach { r =>
      val grp = d.filter(_._3 == r.getString(0))
      val sel = grp.count(x => enRatio(x._4) >= 0.0625)
      val gPos = grp.filter(_._2 == "en")
      val gNeg = grp.filter(_._2 != "en")
      assert(r.getLong(1) == grp.length.toLong)
      assert(r.getDouble(2) == rN(sel.toDouble / grp.length, 6))
      if (gPos.isEmpty) assert(r.isNullAt(3))
      else assert(r.getDouble(3) ==
        rN(gPos.count(x => enRatio(x._4) >= 0.0625).toDouble / gPos.length, 6))
      if (gNeg.isEmpty) assert(r.isNullAt(4))
      else assert(r.getDouble(4) ==
        rN(gNeg.count(x => enRatio(x._4) >= 0.0625).toDouble / gNeg.length, 6))
      assert(r.getDouble(5) == rN(r.getDouble(2) - pooledSel, 6))
      if (!r.isNullAt(3))
        assert(r.getDouble(6) == rN(r.getDouble(3) - pooledTpr, 6))
    }
  }

  test("p135: every bootstrap field equals the from-scratch Poisson replicate fold") {
    val d = docs()
    val xs = d.map { case (id, _, _, ws) => id -> enRatio(ws) }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def weight(id: Long, b: Int): Int = {
      val u = java.lang.Long.parseLong(md5hex(s"${id}_$b").take(8), 16) /
        4294967296.0
      if (u < 0.3678794412) 0 else if (u < 0.7357588823) 1
      else if (u < 0.9196986029) 2 else if (u < 0.9810118431) 3
      else if (u < 0.9963401532) 4 else if (u < 0.9994058152) 5 else 6
    }
    val ms = (0 until 200).flatMap { b =>
      var sw = 0L
      var sx = BigDecimal(0)
      xs.foreach { case (id, x) =>
        val w = weight(id, b)
        sw += w
        sx += BigDecimal(java.math.BigDecimal.valueOf(rN(w * x, 6)))
      }
      if (sw > 0) Some(rN(sx.toDouble / sw, 6)) else None
    }.toArray
    val row = byName("p135_poisson_bootstrap").run(spark, SharedSpark.sf).head()
    assert(row.getLong(0) == d.length.toLong)
    assert(row.getLong(1) == ms.length.toLong)
    val meanX = rN(xs.map(x =>
      BigDecimal(java.math.BigDecimal.valueOf(x._2))).sum.toDouble / d.length, 6)
    assert(row.getDouble(2) == meanX)
    val s1 = ms.map(m => BigDecimal(java.math.BigDecimal.valueOf(m))).sum.toDouble
    val s2 = ms.map(m => BigDecimal(java.math.BigDecimal.valueOf(rN(m * m, 12))))
      .sum.toDouble
    val se = rN(math.sqrt((s2 - s1 * s1 / ms.length) / (ms.length - 1)), 6)
    assert(row.getDouble(3) == se, s"se ${row.getDouble(3)} != $se")
    def pct(p: Double): Double = {
      val sorted = ms.sorted
      val pos = p * (sorted.length - 1)
      val lo = pos.toInt
      val frac = pos - lo
      val v = if (lo + 1 < sorted.length)
        sorted(lo) + frac * (sorted(lo + 1) - sorted(lo)) else sorted(lo)
      rN(v, 6)
    }
    assert(row.getDouble(4) == pct(0.025), s"ci_lo ${row.getDouble(4)} != ${pct(0.025)}")
    assert(row.getDouble(5) == pct(0.975), s"ci_hi ${row.getDouble(5)} != ${pct(0.975)}")
  }

  test("p136: MI top-20 equals the from-scratch dense computation") {
    val d = docs()
    val n = d.length.toLong
    val nL = d.groupBy(_._2).map { case (l, g) => l -> g.length.toLong }
    val cells = scala.collection.mutable.Map.empty[(String, String), Long]
    d.foreach { case (_, lang, _, ws) =>
      ws.toSet.foreach((w: String) =>
        cells((w, lang)) = cells.getOrElse((w, lang), 0L) + 1)
    }
    val nW = cells.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val mi = nW.collect { case (w, dfW) if dfW >= 2 =>
      val t = nL.keys.map { l =>
        val nwl = cells.getOrElse((w, l), 0L)
        val t1 = if (nwl > 0)
          (nwl.toDouble / n) * math.log(nwl.toDouble * n / (dfW.toDouble * nL(l)))
        else 0.0
        val n0 = nL(l) - nwl
        val t2 = if (n0 > 0)
          (n0.toDouble / n) * math.log(n0.toDouble * n / ((n - dfW).toDouble * nL(l)))
        else 0.0
        BigDecimal(java.math.BigDecimal.valueOf(rN(t1 + t2, 9)))
      }.sum
      (w, dfW, rN(t.toDouble, 6))
    }.toSeq
    val expected = mi.sortBy { case (w, _, m) => (-m, w) }.take(20)
    val got = byName("p136_mutual_information").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected, s"MI top-20 mismatch:\n got $got\nwant $expected")
  }
}
