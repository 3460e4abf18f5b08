package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.math.BigDecimal.RoundingMode

/** Batch-45 differentials: bottom-k sampling, held-out perplexity, banded
  * Hamming near-dup, stratified folds, Fano burstiness, and quantile-band
  * drift — each re-derived from scratch in plain Scala.
  */
class PipelineBatch45Spec extends AnyFunSuite {
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

  private def docs = Tables.df(spark, SharedSpark.sf, "documents")

  test("p167: bottom-k sample equals the md5-rank selection") {
    val d = docs.select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val k = d.sortBy(t => (md5hex(t._1.toString), t._1)).take(500)
    val bySrc = d.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val sampSrc = k.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val total = d.length.toDouble
    val rows = byName("p167_bottomk_sample").run(spark, SharedSpark.sf).collect()
    assert(rows.map(_.getString(0)).toSeq == bySrc.keys.toSeq.sorted)
    rows.foreach { r =>
      val src = r.getString(0)
      assert(r.getLong(1) == bySrc(src))
      assert(r.getLong(2) == sampSrc.getOrElse(src, 0L), s"n_sample $src")
      assert(r.getDouble(3) == rN(sampSrc.getOrElse(src, 0L) / 500.0, 6))
      assert(r.getDouble(4) == rN(bySrc(src) / total, 6))
    }
  }

  test("p168: held-out perplexity equals the add-0.5 OOV-bucket derivation") {
    val d = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split("\\s+", -1)))
    val train = d.filter(_._1 % 2 == 0).flatMap(_._2)
    val held = d.filter(_._1 % 2 == 1).flatMap(_._2)
    val cw = train.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (tt, v) = (train.length.toLong, cw.size.toLong)
    val lps = held.map { w =>
      val c = cw.getOrElse(w, 0L)
      (bd(rN(math.log((c + 0.5) / (tt + 0.5 * (v + 1))), 9)), c == 0L)
    }
    val ppl = math.exp(-(lps.map(_._1).sum.toDouble) / held.length)
    val row = byName("p168_heldout_perplexity").run(spark, SharedSpark.sf).head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) ==
      ((tt, held.length.toLong, v)))
    assert(row.getDouble(3) == rN(lps.count(_._2).toDouble / held.length, 6))
    assert(row.getDouble(4) == rN(ppl, 4), s"ppl ${row.getDouble(4)} vs $ppl")
  }

  test("p169: banded candidates + verified Hamming pairs equal the from-scratch pipeline") {
    // from-scratch 60-bit simhash (same definition as the oracle)
    def simhash(toks: Array[String]): Long = {
      val votes = new Array[Long](60)
      toks.foreach { tok =>
        val h = java.lang.Long.parseLong(md5hex(tok).take(15), 16)
        (0 until 60).foreach(b => votes(b) += (if (((h >> b) & 1) == 1) 1 else -1))
      }
      (0 until 60).foldLeft(0L)((acc, b) =>
        if (votes(b) > 0) acc | (1L << b) else acc)
    }
    val sh = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), simhash(r.getString(1).toLowerCase.split("\\s+", -1))))
    val byBand = (0 until 4).flatMap(band =>
      sh.map { case (id, h) => ((band, (h >> (band * 15)) & 32767), (id, h)) })
      .groupBy(_._1).values
    val cand = byBand.flatMap { g =>
      val ms = g.map(_._2).toSeq.sortBy(_._1)
      for (i <- ms.indices; j <- i + 1 until ms.size) yield (ms(i), ms(j))
    }.toSet
    val ver = cand.toSeq.map { case ((_, ha), (_, hb)) =>
      java.lang.Long.bitCount(ha ^ hb)
    }.filter(_ <= 3)
    val row = byName("p169_simhash_hamming").run(spark, SharedSpark.sf).head()
    assert(row.getLong(0) == cand.size.toLong, "n_candidates")
    assert(row.getLong(1) == ver.size.toLong, "n_pairs")
    assert((row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5)) ==
      ((ver.count(_ == 0).toLong, ver.count(_ == 1).toLong,
        ver.count(_ == 2).toLong, ver.count(_ == 3).toLong)))
    // pigeonhole completeness: every pair at Hamming <= 3 is in the candidates
    val all = for (i <- sh.indices; j <- i + 1 until sh.length
      if java.lang.Long.bitCount(sh(i)._2 ^ sh(j)._2) <= 3) yield 1
    assert(all.size == ver.size, "banding missed a near pair")
  }

  test("p170: fold balance equals the stratified round-robin derivation") {
    val d = docs.select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .map(t => (t._1, t._2,
        if (t._3 < 200) "S" else if (t._3 < 400) "M" else "L"))
    val folds = d.groupBy(t => (t._2, t._3)).values.flatMap { g =>
      g.sortBy(t => (md5hex(t._1.toString), t._1)).zipWithIndex
        .map { case ((_, lang, qb), i) => (i % 5, lang, qb) }
    }.toSeq
    val cnt = folds.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tot = folds.groupBy(t => (t._2, t._3)).view.mapValues(_.size.toLong).toMap
    val rows = byName("p170_stratified_kfold").run(spark, SharedSpark.sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    rows.foreach { r =>
      val f = r.getLong(0).toInt
      val mine = cnt.filter(_._1._1 == f)
      assert(r.getLong(1) == mine.values.sum)
      val dev = mine.map { case ((_, lang, qb), n) =>
        math.abs(n.toDouble / tot((lang, qb)) - 0.2)
      }.max
      assert(r.getDouble(2) == rN(dev, 6), s"fold $f dev")
    }
  }

  test("p171: Fano factors equal the per-minute count derivation") {
    val ev = Tables.df(spark, SharedSpark.sf, "events")
      .selectExpr("event_type", "date_trunc('minute', ts) as mn").collect()
      .map(r => (r.getString(0), r.get(1).toString))
    val want = ev.groupBy(_._1).map { case (et, rows) =>
      val counts = rows.groupBy(_._2).values.map(_.size.toLong).toSeq
      val n = counts.size.toLong
      val tot = counts.sum
      val s2 = counts.map(c => c * c).sum
      val mean = tot.toDouble / n
      et -> (n, tot, rN(mean, 6), rN((s2.toDouble / n - mean * mean) / mean, 6))
    }
    val rows = byName("p171_fano_burstiness").run(spark, SharedSpark.sf).collect()
    assert(rows.map(_.getString(0)).toSeq == want.keys.toSeq.sorted)
    rows.foreach { r =>
      val (n, tot, mean, fano) = want(r.getString(0))
      assert((r.getLong(1), r.getLong(2)) == ((n, tot)))
      assert(r.getDouble(3) == mean)
      assert(r.getDouble(4) == fano, s"fano ${r.getString(0)}")
    }
  }

  test("p172: weekly bands + drift flags equal the type-7 quantile derivation") {
    val ev = Tables.df(spark, SharedSpark.sf, "events")
      .selectExpr("cast(floor(datediff(cast(ts as date), date'2024-01-01') / 7.0) as long) as wk",
        "value").collect().map(r => (r.getLong(0), r.getDouble(1)))
    def q(vs: Seq[Double], f: Double): Double = {
      val s = vs.sorted
      val p = f * (s.length - 1)
      val (fl, ce) = (math.floor(p).toInt, math.ceil(p).toInt)
      s(fl) + (p - fl) * (s(ce) - s(fl))
    }
    val bands = ev.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
      .map { case (wk, vs) => wk -> (q(vs, 0.1), q(vs, 0.5), q(vs, 0.9)) }
    val wks = bands.keys.toSeq.sorted
    val rows = byName("p172_quantile_band_drift").run(spark, SharedSpark.sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == wks)
    rows.zipWithIndex.foreach { case (r, i) =>
      val wk = r.getLong(0)
      val (p10, p50, p90) = bands(wk)
      assert(r.getDouble(1) == rN(p10, 4))
      assert(r.getDouble(2) == rN(p50, 4))
      assert(r.getDouble(3) == rN(p90, 4))
      val flag = if (i == 0) 0 else {
        val prev = bands(wks(i - 1))._2
        if (math.abs(p50 - prev) > 0.1 * math.abs(prev)) 1 else 0
      }
      assert(r.getInt(4) == flag, s"drift wk $wk")
    }
  }
}
