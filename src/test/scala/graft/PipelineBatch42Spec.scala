package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.math.BigDecimal.RoundingMode

/** Batch-42 differentials: the KMV intersection algebra, the assortativity
  * of the LSH near-dup graph (full from-scratch MinHash → banding → pair
  * pipeline), and the PSI drift table, each re-derived in plain Scala and
  * compared cell-for-cell.
  */
class PipelineBatch42Spec extends AnyFunSuite {
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

  /** p103's 52-bit hex fraction, Horner form. */
  private def hexFrac(h: String): Double =
    h.take(13).foldRight(0.0)((c, acc) =>
      ("0123456789abcdef".indexOf(c) + acc) / 16.0)

  test("p152: sketch-intersection row equals the from-scratch KMV algebra") {
    val docs = Tables.df(spark, SharedSpark.sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0).drop(3).toInt % 2,
        r.getString(1).toLowerCase.split("\\s+", -1)))
    val grams = docs.filter(_._2.length >= 3).flatMap { case (grp, t) =>
      (0 to t.length - 3).map(i => grp -> md5hex(t.slice(i, i + 3).mkString(" ")))
    }.distinct
    val gA = grams.filter(_._1 == 0).map(_._2).toSet
    val gB = grams.filter(_._1 == 1).map(_._2).toSet
    def est(s: Set[String]): Double =
      rN(63.0 / hexFrac(s.toSeq.sorted.apply(63)), 4)
    val (eA, eB) = (est(gA), est(gB))
    val eU = est(gA ++ gB)
    val row = byName("p152_kmv_intersection").run(spark, SharedSpark.sf).head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) ==
      ((gA.size.toLong, gB.size.toLong, (gA & gB).size.toLong)))
    assert((row.getDouble(3), row.getDouble(4), row.getDouble(5)) == ((eA, eB, eU)))
    assert(row.getDouble(6) == rN(eA + eB - eU, 4))
    assert(row.getDouble(7) ==
      rN(math.abs(eA + eB - eU - (gA & gB).size) / (gA & gB).size, 4))
  }

  test("p153: assortativity equals the full from-scratch LSH + Pearson pipeline") {
    val docs = Tables.df(spark, SharedSpark.sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split("\\s+", -1)))
    val buckets = docs.flatMap { case (id, t) =>
      if (t.length < 3) Seq.empty
      else {
        val shingles = (0 to t.length - 3).map(i => t.slice(i, i + 3).mkString(" "))
          .distinct
        val sig = (0 until 8).map(h => shingles.map(sh => md5hex(s"$h:$sh")).min)
        (0 until 4).map(b => ((b, md5hex(sig(2 * b) + "|" + sig(2 * b + 1))), id))
      }
    }
    val pairs = buckets.groupBy(_._1).values.flatMap { g =>
      val ids = g.map(_._2).sorted
      for (i <- ids.indices; j <- i + 1 until ids.length) yield (ids(i), ids(j))
    }.toSet
    val deg = pairs.toSeq.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (d, g) => d -> g.length.toLong }
    val de = pairs.toSeq.flatMap(p =>
      Seq((deg(p._1), deg(p._2)), (deg(p._2), deg(p._1))))
    val m = de.length.toLong
    val sj = de.map(_._1).sum.toDouble
    val sk = de.map(_._2).sum.toDouble
    val sjk = de.map(x => x._1 * x._2).sum.toDouble
    val sjj = de.map(x => x._1 * x._1).sum.toDouble
    val skk = de.map(x => x._2 * x._2).sum.toDouble
    val varJ = m * sjj - sj * sj
    val varK = m * skk - sk * sk
    val row = byName("p153_degree_assortativity").run(spark, SharedSpark.sf).head()
    assert(row.getLong(0) == deg.size.toLong, "node count")
    assert(row.getLong(1) == pairs.size.toLong, "edge count")
    if (varJ * varK > 0)
      assert(row.getDouble(2) ==
        rN((m * sjk - sj * sk) / math.sqrt(varJ * varK), 6),
        s"assortativity ${row.getDouble(2)}")
    else assert(row.isNullAt(2))
  }

  test("p154: PSI table equals the from-scratch half-split computation") {
    val ev = Tables.df(spark, SharedSpark.sf, "events")
      .selectExpr("unix_micros(CAST(ts AS TIMESTAMP)) AS tus", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val mid = math.floor((ev.map(_._1).min + ev.map(_._1).max) / 2.0).toLong
    val binned = ev.map { case (tus, v) =>
      (if (tus < mid) 0 else 1,
        math.min(math.max(math.floor(math.abs(v) / 10), 0), 9).toInt)
    }
    val t1 = binned.count(_._1 == 0).toLong
    val t2 = binned.count(_._1 == 1).toLong
    val expected = binned.map(_._2).distinct.sorted.map { b =>
      val n1 = binned.count(x => x._1 == 0 && x._2 == b).toLong
      val n2 = binned.count(x => x._1 == 1 && x._2 == b).toLong
      val p1 = (n1 + 0.5) / (t1 + 5.0)
      val p2 = (n2 + 0.5) / (t2 + 5.0)
      (b, n1, n2, rN(p1, 6), rN(p2, 6), rN((p1 - p2) * math.log(p1 / p2), 9))
    }.toSeq
    val got = byName("p154_psi_drift").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expected, s"PSI mismatch:\n got $got\nwant $expected")
  }
}
