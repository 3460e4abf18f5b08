package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.math.BigDecimal.RoundingMode

/** Batch-43 differentials: Mann–Whitney U, the 256-bin quantile sketch, the
  * contrastive-pair audit, the lognormal length fit, the quantile
  * normalization audit, and IDF-weighted Jaccard — each re-derived from
  * scratch in plain Scala on driver-collected rows and compared
  * cell-for-cell against the engine.
  */
class PipelineBatch43Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  private def rN(x: Double, n: Int): Double =
    BigDecimal(java.math.BigDecimal.valueOf(x)).setScale(n, RoundingMode.HALF_UP)
      .toDouble

  private def bd(x: Double): BigDecimal =
    BigDecimal(java.math.BigDecimal.valueOf(x))

  test("p155: tie-corrected Mann-Whitney U equals the sort-and-midrank derivation") {
    val ev = Tables.df(spark, SharedSpark.sf, "events")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .filter(t => t._1 == "click" || t._1 == "view")
    val xs = ev.filter(_._1 == "click").map(_._2)
    val ys = ev.filter(_._1 == "view").map(_._2)
    val all = (xs.map((_, true)) ++ ys.map((_, false))).sortBy(_._1)
    // midranks via run-length groups over the sorted sequence
    var idx = 0
    var rx = 0.0
    while (idx < all.length) {
      var j = idx
      while (j < all.length && all(j)._1 == all(idx)._1) j += 1
      val mid = (idx + 1 + j).toDouble / 2 // mean of ranks idx+1 .. j
      rx += all.slice(idx, j).count(_._2) * mid
      idx = j
    }
    val ties = all.groupBy(_._1).values.map(_.size.toLong)
      .map(t => t * t * t - t).sum
    val (nx, ny) = (xs.length.toLong, ys.length.toLong)
    val n = nx + ny
    val u = rx - nx.toDouble * (nx + 1) / 2
    val mu = nx.toDouble * ny / 2
    val sigma = math.sqrt(nx.toDouble * ny / 12.0 *
      ((n + 1) - ties.toDouble / (n.toDouble * (n - 1))))
    val row = byName("p155_mann_whitney").run(spark, SharedSpark.sf).head()
    assert((row.getLong(0), row.getLong(1)) == ((nx, ny)))
    assert(row.getDouble(2) == u, s"U: ${row.getDouble(2)} vs $u")
    assert(row.getDouble(3) == mu)
    assert(row.getDouble(4) == rN(sigma, 6))
    assert(row.getDouble(5) == rN((u - mu) / sigma, 4))
  }

  test("p156: sketch estimates interpolate the 256-bin histogram; exact side is type-7") {
    val v = Tables.df(spark, SharedSpark.sf, "lineitem")
      .select("l_extendedprice").collect().map(_.getDouble(0)).sorted
    val (lo, hi, n) = (v.head, v.last, v.length)
    val w = (hi - lo) / 256.0
    val counts = new Array[Long](256)
    v.foreach(x => counts(math.min(math.floor((x - lo) / w).toLong, 255L).toInt) += 1)
    val below = counts.scanLeft(0L)(_ + _)
    def est(q: Double): Double = {
      val p = q * (n - 1)
      val b = (0 until 256).find(i => below(i) <= p && p < below(i) + counts(i)).get
      lo + w * (b + (p - below(b) + 0.5) / counts(b))
    }
    def exact(q: Double): Double = {
      val p = q * (n - 1)
      val (f, c) = (math.floor(p).toInt, math.ceil(p).toInt)
      v(f) + (p - f) * (v(c) - v(f))
    }
    val rows = byName("p156_quantile_sketch").run(spark, SharedSpark.sf).collect()
    assert(rows.map(_.getDouble(0)).toSeq == Seq(0.5, 0.9, 0.99))
    rows.foreach { r =>
      val q = r.getDouble(0)
      assert(r.getDouble(1) == rN(est(q), 4), s"est q=$q")
      assert(r.getDouble(2) == rN(exact(q), 4), s"exact q=$q")
      assert(r.getDouble(3) == rN(math.abs(est(q) - exact(q)), 4))
      assert(r.getDouble(4) == rN(math.abs(est(q) - exact(q)) / exact(q), 6))
    }
  }

  test("p157: per-lang pair audit equals the capped-bucket pair enumeration") {
    val docs = Tables.df(spark, SharedSpark.sf, "documents")
      .select("doc_id", "lang", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3).toLowerCase.split("\\s+", -1).distinct.toSet))
    val capped = docs.groupBy(d => (d._2, d._3 / 256))
      .values.flatMap(_.sortBy(_._1).take(15)).toSeq
    val pairs = capped.groupBy(d => (d._2, d._3 / 256)).values.flatMap { g =>
      val sorted = g.sortBy(_._1)
      for (i <- sorted.indices; j <- i + 1 until sorted.size) yield {
        val (a, b) = (sorted(i), sorted(j))
        val inter = (a._4 & b._4).size
        (a._2, rN(inter.toDouble / (a._4.size + b._4.size - inter), 6))
      }
    }.toSeq
    val want = pairs.groupBy(_._1).map { case (lang, ps) =>
      lang -> (ps.size.toLong,
        rN((ps.map(p => bd(p._2)).sum / ps.size).toDouble, 6),
        ps.count(_._2 >= 0.3).toLong)
    }
    val rows = byName("p157_contrastive_pairs").run(spark, SharedSpark.sf).collect()
    assert(rows.map(_.getString(0)).toSeq == want.keys.toSeq.sorted)
    rows.foreach { r =>
      val (np, avg, close) = want(r.getString(0))
      assert(r.getLong(1) == np, s"n_pairs ${r.getString(0)}")
      assert(r.getDouble(2) == avg, s"avg_jac ${r.getString(0)}")
      assert(r.getLong(3) == close, s"n_close ${r.getString(0)}")
    }
  }

  test("p158: lognormal moments + 1-sigma coverage match the decimal derivation") {
    val lens = Tables.df(spark, SharedSpark.sf, "documents")
      .select("n_chars").collect().map(_.getLong(0)).filter(_ > 0)
    val lx = lens.map(l => rN(math.log(l.toDouble), 9))
    val n = lx.length
    val s1 = lx.map(bd).sum
    val s2 = lx.map(x => bd(rN(x * x, 9))).sum
    val mu = (s1 / n).toDouble
    val sigma = math.sqrt(math.max((s2 / n).toDouble - mu * mu, 0.0))
    val nIn = lx.count(x => math.abs(x - mu) <= sigma)
    val row = byName("p158_lognormal_fit").run(spark, SharedSpark.sf).head()
    assert(row.getLong(0) == n.toLong)
    assert(row.getDouble(1) == rN(mu, 6))
    assert(row.getDouble(2) == rN(sigma, 6))
    assert(row.getDouble(3) == rN(nIn.toDouble / n, 6))
    assert(row.getDouble(4) == rN(nIn.toDouble / n - 0.682689, 6))
  }

  test("p159: post-normalization stats match the rank-interpolation derivation") {
    val ev = Tables.df(spark, SharedSpark.sf, "events")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val sorted = ev.map(_._2).sorted
    val n = sorted.length
    def q(f: Double): Double = {
      val p = f * (n - 1)
      val (fl, ce) = (math.floor(p).toInt, math.ceil(p).toInt)
      sorted(fl) + (p - fl) * (sorted(ce) - sorted(fl))
    }
    val grid = (0 to 100).map(i => q(i / 100.0))
    val want = ev.groupBy(_._1).map { case (et, rows) =>
      val vs = rows.map(_._2).sorted
      val m = vs.length
      val nvs = rows.map { case (_, v) =>
        val rank = vs.indexWhere(_ == v) + 1 // rank(): 1 + strictly-below count
        val pr = if (m == 1) 0.0 else (rank - 1).toDouble / (m - 1)
        val g = pr * 100
        val lo = math.floor(g).toInt
        rN(grid(lo) + (g - lo) * (grid(math.min(lo + 1, 100)) - grid(lo)), 6)
      }
      val mean = (nvs.map(bd).sum / m).toDouble
      val e2 = (nvs.map(x => bd(rN(x * x, 9))).sum / m).toDouble
      et -> (m.toLong, rN(mean, 6), rN(math.sqrt(math.max(e2 - mean * mean, 0)), 6))
    }
    val rows = byName("p159_quantile_norm_audit").run(spark, SharedSpark.sf).collect()
    assert(rows.map(_.getString(0)).toSeq == want.keys.toSeq.sorted)
    rows.foreach { r =>
      val (m, mean, std) = want(r.getString(0))
      assert(r.getLong(1) == m)
      assert(r.getDouble(2) == mean, s"mean_norm ${r.getString(0)}")
      assert(r.getDouble(3) == std, s"std_norm ${r.getString(0)}")
    }
  }

  test("p160: IDF-weighted Jaccard equals the from-scratch weighted pipeline") {
    val docs = Tables.df(spark, SharedSpark.sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split("\\s+", -1)))
    val shingles = docs.map { case (id, t) =>
      id -> (0 to t.length - 3).map(i => t.slice(i, i + 3).mkString(" ")).toSet
    }.toMap
    val corpusN = docs.length.toLong
    val dfreq = shingles.values.flatten.groupBy(identity).map { case (s, o) => s -> o.size }
    val cap = math.max(2L, math.floor(corpusN * 0.02).toLong)
    val idf: Map[String, BigDecimal] = dfreq.collect {
      case (s, df) if df <= cap => s -> bd(rN(math.log(corpusN.toDouble / df), 9))
    }.toMap
    val rareSets = shingles.map { case (id, ss) => id -> ss.filter(idf.contains) }
    val wts = rareSets.map { case (id, ss) => id -> ss.toSeq.map(idf).sum }
    val ids = rareSets.keys.toSeq.sorted
    val want = (for {
      i <- ids.indices; j <- i + 1 until ids.size
      (a, b) = (ids(i), ids(j))
      shared = (rareSets(a) & rareSets(b)).toSeq.map(idf).sum if shared > 0
      w = shared.toDouble / (wts(a) + wts(b) - shared).toDouble if w >= 0.4
    } yield (a, b, rN(w, 6))).sortBy(t => (t._1, t._2))
    val rows = byName("p160_idf_weighted_jaccard").run(spark, SharedSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows == want, s"weighted pairs: got ${rows.size}, want ${want.size}")
  }
}
