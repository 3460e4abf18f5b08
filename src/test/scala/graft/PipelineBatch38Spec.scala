package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.math.BigDecimal.RoundingMode

/** Batch-38 differentials: KS, Spearman, and the randomization test each
  * re-derived from scratch in plain Scala with the same quantization,
  * midrank, and md5-coin conventions, compared field-for-field.
  */
class PipelineBatch38Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  private val EnStops = Set("the", "of", "and", "to", "a", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by")

  private def rN(x: Double, n: Int): Double =
    BigDecimal(java.math.BigDecimal.valueOf(x)).setScale(n, RoundingMode.HALF_UP)
      .toDouble

  private def bd(x: Double): BigDecimal =
    BigDecimal(java.math.BigDecimal.valueOf(x))

  private def docs(): Array[(Long, String, String)] =
    Tables.df(spark, SharedSpark.sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  private def ratio(text: String, places: Int): Double = {
    val ws = text.toLowerCase.split("\\s+", -1)
    rN(ws.count(EnStops.contains).toDouble / ws.length, places)
  }

  test("p140: KS statistic equals the from-scratch ECDF computation") {
    val d = docs().map(x => (x._2.drop(3).toInt % 2, ratio(x._3, 4)))
    val g0 = d.filter(_._1 == 0).map(_._2)
    val g1 = d.filter(_._1 == 1).map(_._2)
    val qs = d.map(_._2).distinct.sorted
    val dRaw = qs.map { q =>
      math.abs(g0.count(_ <= q).toDouble / g0.length
        - g1.count(_ <= q).toDouble / g1.length)
    }.max
    val row = byName("p140_ks_test").run(spark, SharedSpark.sf).head()
    assert((row.getLong(0), row.getLong(1)) == ((g0.length.toLong, g1.length.toLong)))
    assert(row.getDouble(2) == rN(dRaw, 6), s"ks_d ${row.getDouble(2)} != ${rN(dRaw, 6)}")
    val crit = rN(1.358 * math.sqrt((g0.length + g1.length).toDouble /
      (g0.length.toLong * g1.length)), 6)
    assert(row.getDouble(3) == crit)
    assert(row.getInt(4) == (if (dRaw > 1.358 * math.sqrt(
      (g0.length + g1.length).toDouble / (g0.length.toLong * g1.length))) 1 else 0))
  }

  test("p141: Spearman rho equals the from-scratch midrank computation") {
    val d = docs().map(x => (ratio(x._3, 4), x._3.length.toLong))
    def midranks[T](vs: Array[T])(implicit o: Ordering[T]): Map[T, Double] = {
      val counts = vs.groupBy(identity).map { case (v, g) => v -> g.length.toLong }
      var below = 0L
      counts.toSeq.sortBy(_._1).map { case (v, c) =>
        val r = below + (c + 1) / 2.0
        below += c
        v -> r
      }.toMap
    }
    val rx = midranks(d.map(_._1))
    val ry = midranks(d.map(_._2))
    val pairs = d.map { case (q, y) => (rx(q), ry(y)) }
    val n = pairs.length.toLong
    val sx = pairs.map(p => bd(p._1)).sum.toDouble
    val sy = pairs.map(p => bd(p._2)).sum.toDouble
    val sxy = pairs.map(p => bd(p._1) * bd(p._2)).sum.toDouble
    val sxx = pairs.map(p => bd(p._1) * bd(p._1)).sum.toDouble
    val syy = pairs.map(p => bd(p._2) * bd(p._2)).sum.toDouble
    val rho = rN((n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
    val row = byName("p141_spearman_corr").run(spark, SharedSpark.sf).head()
    assert(row.getLong(0) == n)
    assert(row.getDouble(1) == rho, s"rho ${row.getDouble(1)} != $rho")
  }

  test("p142: randomization p-value equals the from-scratch md5-coin fold") {
    val d = docs().map(x => (x._1, x._2.drop(3).toInt % 2, ratio(x._3, 6)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def coin(id: Long, b: Int): Int =
      if (java.lang.Long.parseLong(md5hex(s"${id}_$b").take(8), 16) /
        4294967296.0 < 0.5) 0 else 1
    def diff(xs: Seq[(Int, Double)]): Option[Double] = {
      val a = xs.filter(_._1 == 0).map(_._2)
      val b = xs.filter(_._1 == 1).map(_._2)
      if (a.isEmpty || b.isEmpty) None
      else Some(rN(a.map(bd).sum.toDouble / a.length, 6)
        - rN(b.map(bd).sum.toDouble / b.length, 6))
    }
    val dObs = diff(d.map(x => (x._2, x._3))).get
    val nulls = (0 until 200).flatMap { b =>
      diff(d.map(x => (coin(x._1, b), x._3)))
    }
    val p = rN((1.0 + nulls.count(nd => math.abs(nd) >= math.abs(dObs)))
      / (nulls.length + 1), 6)
    val row = byName("p142_permutation_test").run(spark, SharedSpark.sf).head()
    assert(row.getDouble(0) == rN(dObs, 6), s"d_obs ${row.getDouble(0)}")
    assert(row.getLong(1) == nulls.length.toLong)
    assert(row.getDouble(2) == p, s"p_perm ${row.getDouble(2)} != $p")
  }
}
