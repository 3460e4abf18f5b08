package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.math.BigDecimal.RoundingMode

/** Batch-52 differentials: retrieval diversity, Simpson audit, simhash bit
  * bias, power/MDE, decile lift, kNN reciprocity — re-derived in plain
  * Scala at sf0.001.
  */
class PipelineBatch52Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  private def rN(x: Double, n: Int): Double =
    BigDecimal(java.math.BigDecimal.valueOf(x)).setScale(n, RoundingMode.HALF_UP)
      .toDouble

  private def bd9(x: Double): BigDecimal =
    BigDecimal(java.math.BigDecimal.valueOf(x)).setScale(9, RoundingMode.HALF_UP)

  private lazy val events = Tables.df(spark, SharedSpark.sf, "events")
    .select("event_id", "user_id", "event_type", "value").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))

  private lazy val vecs = Tables.df(spark, SharedSpark.sf, "embeddings")
    .select("vec_id", "embedding").collect()
    .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.indices.map(i => a(i) * b(i)).sum
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  private def topk(src: Array[Double], srcId: Long,
      pool: Seq[(Long, Array[Double])], k: Int): Seq[(Long, Double)] =
    pool.filter(_._1 != srcId).map { case (id, v) => (id, cos(src, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(k)

  test("p205: top-5 relevance and intra-list cosine equal brute force") {
    val byId = vecs.toMap
    val rows = byName("p205_retrieval_diversity").run(spark, SharedSpark.sf)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L to 7L))
    rows.foreach { r =>
      val q = r.getLong(0)
      val nn = topk(byId(q), q, vecs.toSeq, 5)
      val rel = nn.map(x => bd9(x._2)).sum.toDouble / 5
      val res = nn.map(_._1).map(byId)
      val pcs = for (i <- res.indices; j <- res.indices if {
        // pair by ascending vec_id, matching the a.vec_id < b.vec_id join
        nn(i)._1 < nn(j)._1
      }) yield bd9(cos(res(i), res(j)))
      val intra = pcs.sum.toDouble / 10
      assert(r.getDouble(1) == rN(rel, 6), s"rel for q$q")
      assert(r.getDouble(2) == rN(intra, 6), s"intra for q$q")
    }
  }

  test("p206: slopes equal the sufficient-sum recount; flips flagged") {
    val cells = events.groupBy(e => (e._3, e._2)).toSeq.map { case ((t, _), es) =>
      val x = es.length.toLong
      val y = es.map(e => BigDecimal(java.math.BigDecimal.valueOf(e._4))
        .setScale(2, RoundingMode.HALF_UP)).sum.toDouble / x
      (t, x, BigDecimal(java.math.BigDecimal.valueOf(y))
        .setScale(6, RoundingMode.HALF_UP))
    }
    def slope(cs: Seq[(String, Long, BigDecimal)]): Double = {
      val n = cs.length
      val sx = cs.map(_._2).sum
      val sy = cs.map(_._3).sum.toDouble
      val sxx = cs.map(c => c._2 * c._2).sum
      val sxy = cs.map(c => BigDecimal(c._2) * c._3).sum.toDouble
      (sxy - sx.toDouble * sy / n) / (sxx.toDouble - sx.toDouble * sx / n)
    }
    val pooled = slope(cells)
    val rows = byName("p206_simpsons_audit").run(spark, SharedSpark.sf).collect()
    rows.foreach { r =>
      val g = cells.filter(_._1 == r.getString(0))
      assert(r.getLong(1) == g.length.toLong)
      assert(r.getDouble(2) == rN(slope(g), 6), s"slope ${r.getString(0)}")
      assert(r.getDouble(3) == rN(pooled, 6))
      assert(r.getInt(4) == (if (slope(g) * pooled < 0) 1 else 0))
    }
    // the synthetic corpus genuinely contains a flip — the audit must see it
    assert(rows.exists(_.getInt(4) == 1), "expected at least one sign flip")
  }

  test("p207: per-bit shares equal the md5-vote recount and stay in [0,1]") {
    val docs = Tables.df(spark, SharedSpark.sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val hashes = docs.map { case (_, t) =>
      val toks = t.toLowerCase.split("\\s+", -1)
      (0 until 60).map { bit =>
        val vote = toks.map { tok =>
          val h = java.lang.Long.parseLong(md5hex(tok).take(15), 16)
          if (((h >> bit) & 1L) == 1L) 1 else -1
        }.sum
        if (vote > 0) 1 else 0
      }
    }
    val rows = byName("p207_simhash_bit_bias").run(spark, SharedSpark.sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L until 60L))
    rows.foreach { r =>
      val bit = r.getLong(0).toInt
      val ones = hashes.map(_(bit)).sum.toLong
      assert(r.getLong(1) == ones, s"bit $bit")
      assert(r.getDouble(2) == rN(ones.toDouble / docs.length, 6))
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
  }

  test("p208: MDE equals the pooled-sd formula") {
    val rows = byName("p208_ab_power_mde").run(spark, SharedSpark.sf).collect()
    rows.foreach { r =>
      val t = r.getString(0)
      val es = events.filter(_._3 == t)
      val (a0, a1) = es.partition(_._2 % 2 == 0)
      assert(r.getLong(1) == a0.length.toLong && r.getLong(2) == a1.length.toLong)
      val n = es.length
      val sx = es.map(e => BigDecimal(java.math.BigDecimal.valueOf(e._4))
        .setScale(2, RoundingMode.HALF_UP)).sum.toDouble
      val sxx = es.map(e => BigDecimal(java.math.BigDecimal.valueOf(e._4 * e._4))
        .setScale(4, RoundingMode.HALF_UP)).sum.toDouble
      val sd = math.sqrt((sxx - sx * sx / n) / (n - 1))
      val mde = (1.959963985 + 0.841621234) * sd *
        math.sqrt(1.0 / a0.length + 1.0 / a1.length)
      assert(r.getDouble(3) == rN(sd, 6), s"sd for $t")
      assert(r.getDouble(4) == rN(mde, 6), s"mde for $t")
      assert(r.getDouble(5) == rN(mde / (sx / n), 6), s"mde_rel for $t")
    }
  }

  test("p209: lift table equals the decile recount; capture is monotone") {
    val users = events.groupBy(_._2).toSeq.map { case (_, es) =>
      (es.length.toLong, if (es.exists(_._3 == "purchase")) 1L else 0L)
    }
    // type-7 boundaries over the activity distribution
    val sorted = users.map(_._1.toDouble).sorted
    def q(p: Double): Double = {
      val pos = p * (sorted.length - 1)
      val lo = pos.toInt
      if (lo == sorted.length - 1) sorted(lo)
      else sorted(lo) + (pos - lo) * (sorted(lo + 1) - sorted(lo))
    }
    val bounds = (1 to 9).map(i => q(i / 10.0))
    val byDec = users.groupBy { case (a, _) =>
      1 + bounds.count(_ <= a.toDouble)
    }
    val totConv = users.map(_._2).sum
    val rows = byName("p209_decile_lift_table").run(spark, SharedSpark.sf).collect()
    assert(rows.map(r => r.getInt(0)).toSet == byDec.keySet)
    rows.foreach { r =>
      val d = r.getInt(0)
      val us = byDec(d)
      assert(r.getLong(1) == us.length.toLong)
      assert(r.getLong(2) == us.map(_._2).sum)
      val above = byDec.filter(_._1 >= d).values.flatten.map(_._2).sum
      assert(r.getDouble(5) == rN(above.toDouble / totConv, 6), s"capture d$d")
    }
    // cumulative capture decreases with decile rank and bottoms at 1.0 for d=min
    val caps = rows.sortBy(_.getInt(0)).map(_.getDouble(5))
    assert(caps.head == 1.0)
    assert(caps.zip(caps.tail).forall { case (a, b) => a >= b - 1e-9 })
  }

  test("p210: reciprocity equals the brute-force mutual-edge recount") {
    val tier = vecs.filter(_._1 < 64).toSeq
    val edges = tier.flatMap { case (id, v) =>
      topk(v, id, tier, 5).map { case (nid, c) => ((id, nid), c) }
    }.toMap
    val mutual = edges.keys.filter { case (a, b) => edges.contains((b, a)) }.toSeq
    val row = byName("p210_knn_reciprocity").run(spark, SharedSpark.sf).head()
    assert(row.getLong(0) == tier.length.toLong)
    assert(row.getLong(1) == edges.size.toLong)
    assert(row.getLong(2) == mutual.length.toLong)
    assert(row.getDouble(3) == rN(mutual.length.toDouble / edges.size, 6))
    val meanCos = mutual.map(e => bd9(edges(e))).sum.toDouble / mutual.length
    assert(row.getDouble(4) == rN(meanCos, 6))
  }
}
