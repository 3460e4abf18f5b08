package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.math.BigDecimal.RoundingMode

/** Batch-50 differentials: label silhouette, conformal coverage, embedding
  * isotropy, overdispersion, quality Pareto, empirical-Bayes shrinkage —
  * each re-derived from scratch in plain Scala at sf0.001.
  */
class PipelineBatch50Spec extends AnyFunSuite {
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

  private lazy val docs = Tables.df(spark, SharedSpark.sf, "documents")
    .select("doc_id", "text", "source", "n_chars").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  private lazy val vecs = Tables.df(spark, SharedSpark.sf, "embeddings")
    .select("vec_id", "label", "embedding").collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).map(_.toDouble).toArray))

  test("p193: silhouette equals brute force, bounded in [-1, 1]") {
    val cents = vecs.groupBy(_._2).view.mapValues { vs =>
      val dims = vs.head._3.length
      Array.tabulate(dims) { d =>
        vs.map(v => bd9(v._3(d))).sum.toDouble / vs.length
      }
    }.toMap
    def dist(x: Array[Double], c: Array[Double]): Double =
      math.sqrt(x.indices.map(i => bd9((x(i) - c(i)) * (x(i) - c(i)))).sum.toDouble)
    val silByLabel = vecs.groupBy(_._2).view.mapValues { vs =>
      val ss = vs.map { case (_, l, x) =>
        val a = dist(x, cents(l))
        val b = cents.filter(_._1 != l).values.map(dist(x, _)).min
        bd9((b - a) / math.max(a, b))
      }
      ss.sum.toDouble / ss.length
    }.toMap
    val rows = byName("p193_label_silhouette").run(spark, SharedSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val want = rN(silByLabel(r.getInt(0)), 6)
      assert(r.getDouble(2) == want, s"label ${r.getInt(0)}: ${r.getDouble(2)} vs $want")
      assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0)
    }
  }

  test("p194: conformal coverage equals the split recount and sits near 0.9") {
    val calib = events.filter(_._1 % 2 == 0)
    val test = events.filter(_._1 % 2 == 1)
    val mu = calib.groupBy(_._3).view.mapValues { es =>
      es.map(e => BigDecimal(java.math.BigDecimal.valueOf(e._4))
        .setScale(2, RoundingMode.HALF_UP)).sum.toDouble / es.length
    }.toMap
    val resid = calib.map(e => math.abs(e._4 - mu(e._3))).sorted
    val pos = 0.9 * (resid.length - 1) // type-7
    val lo = pos.toInt
    val q90 =
      if (lo == resid.length - 1) resid(lo)
      else resid(lo) + (pos - lo) * (resid(lo + 1) - resid(lo))
    val rows = byName("p194_conformal_coverage").run(spark, SharedSpark.sf).collect()
    val overallCovered = test.count(e => math.abs(e._4 - mu(e._3)) <= q90)
    rows.foreach { r =>
      val t = r.getString(0)
      val ts = test.filter(_._3 == t)
      assert(r.getLong(1) == ts.length.toLong)
      assert(r.getDouble(2) == rN(q90, 6), s"q90 ${r.getDouble(2)} vs $q90")
      val cov = ts.count(e => math.abs(e._4 - mu(e._3)) <= q90).toDouble / ts.length
      assert(r.getDouble(3) == rN(cov, 6), s"coverage for $t")
    }
    // conformal guarantee: overall held-out coverage concentrates near 0.9
    val overall = overallCovered.toDouble / test.length
    assert(overall > 0.82 && overall < 0.98, s"overall coverage $overall")
  }

  test("p195: isotropy stats equal the paired recount") {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.indices.map(i => a(i) * b(i)).sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val byId = vecs.map(v => v._1 -> v._3).toMap
    val pairs = vecs.flatMap { case (id, _, x) =>
      val pid = id ^ 1L
      if (id < pid) byId.get(pid).map(y => cos(x, y)) else None
    }
    val meanCos = pairs.map(bd9(_)).sum.toDouble / pairs.length
    val norms = vecs.map(v => math.sqrt(
      v._3.indices.map(i => bd9(v._3(i) * v._3(i))).sum.toDouble))
    val meanNorm = norms.map(bd9(_)).sum.toDouble / norms.length
    val dims = vecs.head._3.length
    val center = Array.tabulate(dims) { d =>
      vecs.map(v => bd9(v._3(d))).sum.toDouble / vecs.length
    }
    val centerNorm = math.sqrt(center.map(m => bd9(m * m)).sum.toDouble)
    val row = byName("p195_embedding_isotropy").run(spark, SharedSpark.sf).head()
    assert(row.getLong(0) == pairs.length.toLong)
    assert(math.abs(row.getDouble(1) - meanCos) < 2e-6, "mean pair cos")
    assert(row.getDouble(2) == rN(meanNorm, 6))
    assert(row.getDouble(3) == rN(centerNorm, 6))
    // random-ish embeddings: pair cosine near 0, center norm well under norms
    assert(math.abs(row.getDouble(1)) < 0.5)
    assert(row.getDouble(4) < 1.0, "anisotropy ratio must be < 1")
  }

  test("p196: dispersion equals the per-user recount") {
    val rows = byName("p196_overdispersion").run(spark, SharedSpark.sf).collect()
    rows.foreach { r =>
      val t = r.getString(0)
      val cs = events.filter(_._3 == t).groupBy(_._2).values.map(_.length.toLong).toSeq
      val n = cs.length
      val sc = cs.sum
      val scc = cs.map(c => c * c).sum
      val mean = sc.toDouble / n
      val v = (scc.toDouble - sc.toDouble * sc / n) / (n - 1)
      assert(r.getLong(1) == n.toLong)
      assert(r.getDouble(2) == rN(mean, 6))
      assert(r.getDouble(3) == rN(v, 6))
      assert(r.getDouble(4) == rN(v / mean, 4))
    }
  }

  test("p197: Pareto curve is monotone and ends at 1.0; shares recount") {
    val stops = Set("the", "a", "and", "of", "to", "in", "is")
    val bySrc = docs.groupBy(_._3).view.mapValues { ds =>
      val toks = ds.map(_._2.toLowerCase.split("\\s+", -1))
      val nTok = toks.map(_.length.toLong).sum
      val nStop = toks.map(_.count(stops.contains).toLong).sum
      (nTok, rN(nStop.toDouble / nTok, 6))
    }.toMap
    val rows = byName("p197_quality_pareto").run(spark, SharedSpark.sf).collect()
    assert(rows.map(_.getString(0)).toSet == bySrc.keySet)
    val total = bySrc.values.map(_._1).sum.toDouble
    var cum = 0L
    // rows arrive ranked q desc, source asc — recompute the running share
    rows.foreach { r =>
      val (nTok, q) = bySrc(r.getString(0))
      assert(r.getLong(1) == nTok)
      assert(r.getDouble(2) == q)
      cum += nTok
      assert(r.getDouble(3) == rN(cum / total, 6))
    }
    assert(rows.last.getDouble(3) == 1.0)
    assert(rows.map(_.getDouble(2)).toSeq == rows.map(_.getDouble(2)).toSeq.sorted.reverse,
      "rows must be ranked by quality desc")
  }

  test("p198: EB shrinkage pulls means toward the grand mean, B in [0,1]") {
    val g = docs.groupBy(_._3).view.mapValues { ds =>
      val xs = ds.map(_._4)
      val n = xs.length
      val sx = xs.sum
      val sxx = xs.map(x => x * x).sum
      val mean = sx.toDouble / n
      val v = (sxx.toDouble - sx.toDouble * sx / n) / (n - 1)
      (n, mean, v)
    }.toMap
    val k = g.size
    val grand = g.values.map(x => bd9(x._2)).sum.toDouble / k
    val vbar = g.values.map(x => bd9(x._3 / x._1)).sum.toDouble / k
    val sm = g.values.map(x => bd9(x._2)).sum.toDouble
    val between = (g.values.map(x => bd9(x._2 * x._2)).sum.toDouble - sm * sm / k) / (k - 1)
    val tau2 = math.max(0.0, between - vbar)
    val rows = byName("p198_eb_shrinkage").run(spark, SharedSpark.sf).collect()
    assert(rows.length == k)
    rows.foreach { r =>
      val (n, mean, v) = g(r.getString(0))
      val b = tau2 / (tau2 + v / n)
      assert(r.getLong(1) == n.toLong)
      assert(r.getDouble(2) == rN(mean, 6))
      assert(r.getDouble(3) == rN(b, 6), s"B for ${r.getString(0)}")
      assert(r.getDouble(4) == rN(grand + b * (mean - grand), 6))
      assert(b >= 0.0 && b <= 1.0)
      // shrinkage never overshoots: eb_mean lies between raw mean and grand
      val lo = math.min(mean, grand) - 1e-9
      val hi = math.max(mean, grand) + 1e-9
      assert(r.getDouble(4) >= lo && r.getDouble(4) <= hi)
    }
  }
}
