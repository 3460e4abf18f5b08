package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.math.BigDecimal.RoundingMode

/** Batch-46 differentials: SCD2 version history, the unigram^0.75
  * negative-sampling table, join-size estimation, entropy compression
  * proxy, blocking recall, and the Bloom join prefilter — each re-derived
  * from scratch in plain Scala.
  */
class PipelineBatch46Spec extends AnyFunSuite {
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

  test("p173: version histogram equals the per-user transition derivation") {
    val ev = Tables.df(spark, SharedSpark.sf, "events")
      .selectExpr("user_id", "event_id", "cast(ts as string) as t", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    val versions = ev.groupBy(_._1).values.map { g =>
      val types = g.sortBy(t => (t._3, t._2)).map(_._4)
      1L + types.zip(types.drop(1)).count { case (a, b) => a != b }
    }.toSeq
    val want = versions.groupBy(v => math.min(v / 10, 9L)).view
      .mapValues(vs => (vs.size.toLong, vs.sum)).toMap
    val rows = byName("p173_scd2_history").run(spark, SharedSpark.sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == want.keys.toSeq.sorted)
    rows.foreach { r =>
      assert((r.getLong(1), r.getLong(2)) == want(r.getLong(0)),
        s"bucket ${r.getLong(0)}")
    }
  }

  test("p174: top-20 negative-sampling shares equal the sqrt-sqrt-cube derivation") {
    val words = Tables.df(spark, SharedSpark.sf, "documents")
      .select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split("\\s+", -1))
    val c = words.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val wt = c.map { case (w, n) =>
      w -> bd(rN(math.sqrt(math.sqrt(n.toDouble * n * n)), 6))
    }
    val tw = wt.values.sum
    val top = c.toSeq.sortBy(t => (-t._2, t._1)).take(20)
    var cum = BigDecimal(0)
    val want = top.map { case (w, n) =>
      cum += wt(w)
      (w, n, rN((wt(w) / tw).toDouble, 6), rN((cum / tw).toDouble, 6))
    }
    val rows = byName("p174_negative_sampling").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.toSeq == want, s"got ${rows.take(3).mkString(",")}")
  }

  test("p175: exact and sampled join sizes equal the per-key product derivation") {
    val ca = Tables.df(spark, SharedSpark.sf, "events")
      .select("user_id").collect().map(_.getLong(0) % 1000)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cb = Tables.df(spark, SharedSpark.sf, "customer")
      .select("c_custkey").collect().map(_.getLong(0) % 1000)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val keys = ca.keySet & cb.keySet
    val exact = keys.toSeq.map(k => ca(k) * cb(k)).sum
    val est = 16L * keys.toSeq
      .filter(k => java.lang.Long.parseLong(md5hex(k.toString).take(2), 16) % 16 == 0)
      .map(k => ca(k) * cb(k)).sum
    val row = byName("p175_join_size_estimator").run(spark, SharedSpark.sf).head()
    assert(row.getLong(0) == keys.size.toLong)
    assert(row.getLong(1) == exact)
    assert(row.getLong(2) == est)
    assert(row.getDouble(3) == rN(math.abs(est.toDouble - exact) / exact, 6))
  }

  test("p176: per-source entropy equals the char-unigram derivation") {
    val d = Tables.df(spark, SharedSpark.sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val want = d.groupBy(_._1).map { case (src, docs) =>
      val chars = docs.flatMap(_._2.toSeq)
      val n = chars.length.toLong
      val counts = chars.groupBy(identity).view.mapValues(_.length.toLong)
      val h = counts.values.map { cc =>
        val p = cc.toDouble / n
        bd(rN(-p * math.log(p), 9))
      }.sum.toDouble
      val bits = h / math.log(2)
      src -> (n, counts.size.toLong, rN(bits, 6), rN(8 / bits, 4))
    }
    val rows = byName("p176_compression_proxy").run(spark, SharedSpark.sf).collect()
    assert(rows.map(_.getString(0)).toSeq == want.keys.toSeq.sorted)
    rows.foreach { r =>
      val (n, alpha, bits, ratio) = want(r.getString(0))
      assert((r.getLong(1), r.getLong(2)) == ((n, alpha)), r.getString(0))
      assert(r.getDouble(3) == bits, s"bits ${r.getString(0)}")
      assert(r.getDouble(4) == ratio, s"ratio ${r.getString(0)}")
    }
  }

  test("p177: blocking recall equals the group-size pair arithmetic") {
    val d = Tables.df(spark, SharedSpark.sf, "documents")
      .select("doc_id", "lang", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2) / 256,
        md5hex(r.getString(3).toLowerCase.take(50))))
    val truthGroups = d.groupBy(_._4).filter(_._2.length > 1)
    val truthPairs = truthGroups.values.map(g => g.length.toLong * (g.length - 1) / 2).sum
    val blockedPairs = truthGroups.values.flatMap(
      _.groupBy(t => (t._2, t._3)).values.filter(_.length > 1)
        .map(g => g.length.toLong * (g.length - 1) / 2)).sum
    val row = byName("p177_blocking_recall").run(spark, SharedSpark.sf).head()
    assert(row.getLong(0) == truthPairs, "truth_pairs")
    assert(row.getLong(1) == blockedPairs, "blocked_pairs")
    assert(row.getDouble(2) == rN(blockedPairs.toDouble / truthPairs, 6))
  }

  test("p178: bloom pass/false-pass equal the from-scratch 3-hash bit-set derivation") {
    val members = Tables.df(spark, SharedSpark.sf, "orders")
      .selectExpr("o_orderkey", "o_orderpriority").collect()
      .filter(_.getString(1) == "1-URGENT").map(_.getLong(0)).toSet
    val bits = (for (j <- 0 until 3; k <- members)
      yield (j, md5hex(s"$j:$k").take(3))).toSet
    val keys = Tables.df(spark, SharedSpark.sf, "lineitem")
      .select("l_orderkey").collect().map(_.getLong(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    def pass(k: Long): Boolean =
      (0 until 3).forall(j => bits((j, md5hex(s"$j:$k").take(3))))
    val nProbe = keys.values.sum
    val nExact = keys.filter(t => members(t._1)).values.sum
    val nPass = keys.filter(t => pass(t._1)).values.sum
    val row = byName("p178_bloom_join_prefilter").run(spark, SharedSpark.sf).head()
    assert(row.getLong(0) == nProbe)
    assert(row.getLong(1) == nExact)
    assert(row.getLong(2) == nPass, "bloom pass")
    assert(row.getLong(3) == nPass - nExact)
    assert(row.getDouble(4) == rN(1 - nPass.toDouble / nProbe, 6))
    // the bloom never misses a true member (no false negatives)
    assert(members.forall(pass), "bloom produced a false negative")
  }
}
