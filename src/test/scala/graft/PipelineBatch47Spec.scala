package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.math.BigDecimal.RoundingMode

/** Batch-47 differentials: t-closeness, last-touch attribution,
  * association lift, CUPED, Burrows' Delta, and the upsert-merge audit —
  * each re-derived from scratch in plain Scala.
  */
class PipelineBatch47Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  private def rN(x: Double, n: Int): Double =
    BigDecimal(java.math.BigDecimal.valueOf(x)).setScale(n, RoundingMode.HALF_UP)
      .toDouble

  private def bd(x: Double): BigDecimal =
    BigDecimal(java.math.BigDecimal.valueOf(x))

  private def events = Tables.df(spark, SharedSpark.sf, "events")

  test("p179: t-closeness equals the TVD-over-groups derivation") {
    val d = Tables.df(spark, SharedSpark.sf, "documents")
      .select("lang", "n_chars", "source").collect()
      .map(r => ((r.getString(0), r.getLong(1) / 256), r.getString(2)))
    val n = d.length
    val global = d.groupBy(_._2).view.mapValues(_.length.toDouble / n).toMap
    val tvds = d.groupBy(_._1).values.map { g =>
      val t = g.length
      val shares = g.groupBy(_._2).view.mapValues(_.length.toDouble / t).toMap
      // .toSeq: Map.keys is set-backed, and mapping a Set would collapse
      // the duplicate |0 - global| terms of absent sources into one
      val sum = global.keys.toSeq.map(src =>
        bd(rN(math.abs(shares.getOrElse(src, 0.0) - global(src)), 9))).sum
      rN(0.5 * sum.toDouble, 6)
    }.toSeq
    val row = byName("p179_t_closeness").run(spark, SharedSpark.sf).head()
    assert(row.getLong(0) == tvds.size.toLong)
    assert(row.getDouble(1) == rN(tvds.max, 6))
    assert(row.getLong(2) == tvds.count(_ > 0.3).toLong)
    assert(row.getDouble(3) == rN((tvds.map(bd).sum / tvds.size).toDouble, 6))
  }

  test("p180: attribution counts equal the scan-back derivation") {
    val ev = events.selectExpr("user_id", "event_id",
      "cast(ts as string) as t", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    val attributed = ev.groupBy(_._1).values.flatMap { g =>
      val s = g.sortBy(t => (t._3, t._2))
      s.indices.filter(i => s(i)._4 == "purchase").map { i =>
        val touch = (i - 1 to 0 by -1).map(s(_)._4).find(_ != "purchase")
        (s(i)._1, touch.getOrElse("none"))
      }
    }.toSeq
    val want = attributed.groupBy(_._2).view
      .mapValues(g => (g.size.toLong, g.map(_._1).distinct.size.toLong)).toMap
    val rows = byName("p180_funnel_attribution").run(spark, SharedSpark.sf).collect()
    assert(rows.map(_.getString(0)).toSeq == want.keys.toSeq.sorted)
    rows.foreach(r =>
      assert((r.getLong(1), r.getLong(2)) == want(r.getString(0)), r.getString(0)))
  }

  test("p181: support/confidence/lift equal the basket derivation") {
    val b = events.select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).distinct
    val users = b.map(_._1).distinct.length.toLong
    val ca = b.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val byUser = b.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rows = byName("p181_association_lift").run(spark, SharedSpark.sf).collect()
    rows.foreach { r =>
      val (lhs, rhs) = (r.getString(0), r.getString(1))
      val cab = byUser.values.count(s => s(lhs) && s(rhs)).toLong
      assert(r.getDouble(2) == rN(cab.toDouble / users, 6), s"support $lhs->$rhs")
      assert(r.getDouble(3) == rN(cab.toDouble / ca(lhs), 6), s"conf $lhs->$rhs")
      assert(r.getDouble(4) ==
        rN((cab.toDouble / ca(lhs)) / (ca(rhs).toDouble / users), 6),
        s"lift $lhs->$rhs")
    }
    assert(rows.length == 20) // 5 types, directed pairs
  }

  test("p182: CUPED theta and variance reduction equal the moment derivation") {
    val ev = events.selectExpr("user_id", "cast(ts as date) < date'2024-01-16' as pre",
      "value").collect().map(r => (r.getLong(0), r.getBoolean(1), r.getDouble(2)))
    val perUser = ev.groupBy(_._1).values.flatMap { g =>
      val (pre, post) = g.partition(_._2)
      if (pre.isEmpty || post.isEmpty) None
      else Some((
        rN((pre.map(t => bd(t._3)).sum / pre.length).toDouble, 6),
        rN((post.map(t => bd(t._3)).sum / post.length).toDouble, 6)))
    }.toSeq
    val n = perUser.length
    val sx = perUser.map(t => bd(t._1)).sum.toDouble
    val sy = perUser.map(t => bd(t._2)).sum.toDouble
    val sxy = perUser.map(t => bd(rN(t._1 * t._2, 9))).sum.toDouble
    val sxx = perUser.map(t => bd(rN(t._1 * t._1, 9))).sum.toDouble
    val syy = perUser.map(t => bd(rN(t._2 * t._2, 9))).sum.toDouble
    val cov = sxy / n - (sx / n) * (sy / n)
    val varX = sxx / n - (sx / n) * (sx / n)
    val varY = syy / n - (sy / n) * (sy / n)
    val row = byName("p182_cuped_adjustment").run(spark, SharedSpark.sf).head()
    assert(row.getLong(0) == n.toLong)
    assert(row.getDouble(1) == rN(cov / varX, 6))
    assert(row.getDouble(2) == rN(varY, 6))
    assert(row.getDouble(3) == rN(varY - cov * cov / varX, 6))
    assert(row.getDouble(4) == rN(100 * (cov * cov / varX) / varY, 4))
  }

  test("p183: nearest stylometric neighbors equal the z-score Delta derivation") {
    val d = Tables.df(spark, SharedSpark.sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).toLowerCase.split("\\s+", -1)))
    val all = d.flatMap(_._2)
    val top = all.groupBy(identity).view.mapValues(_.length).toSeq
      .sortBy(t => (-t._2, t._1)).take(30).map(_._1)
    val srcTokens = d.groupBy(_._1).view.mapValues(_.flatMap(_._2)).toMap
    val f = for (src <- srcTokens.keys.toSeq; w <- top) yield {
      val toks = srcTokens(src)
      ((src, w), rN(toks.count(_ == w).toDouble / toks.length, 9))
    }
    val fm = f.toMap
    val srcs = srcTokens.keys.toSeq.sorted
    val stats = top.map { w =>
      val fs = srcs.map(s => fm((s, w)))
      val mu = (fs.map(bd).sum / fs.length).toDouble
      val e2 = (fs.map(x => bd(rN(x * x, 18))).sum / fs.length).toDouble
      w -> (mu, math.sqrt(math.max(e2 - mu * mu, 0)))
    }.toMap
    val usable = top.filter(w => stats(w)._2 > 0)
    val z = (for (s <- srcs; w <- usable)
      yield ((s, w), rN((fm((s, w)) - stats(w)._1) / stats(w)._2, 6))).toMap
    val want = srcs.map { sa =>
      val deltas = srcs.filter(_ != sa).map { sb =>
        val sum = usable.map(w => bd(rN(math.abs(z((sa, w)) - z((sb, w))), 9))).sum
        (sb, rN((sum / usable.length).toDouble, 6))
      }
      val best = deltas.minBy(t => (t._2, t._1))
      (sa, best._1, best._2)
    }
    val rows = byName("p183_stylometry_delta").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
    assert(rows == want)
  }

  test("p184: merge cardinalities equal the keep-last snapshot derivation") {
    val ev = events.selectExpr("user_id", "event_id",
      "cast(ts as string) as t", "value",
      "cast(ts as date) < date'2024-01-16' as pre").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
        r.getBoolean(4)))
    def latest(rows: Seq[(Long, Long, String, Double, Boolean)]): Map[Long, Double] =
      rows.groupBy(_._1).view.mapValues(_.maxBy(t => (t._3, t._2))._4).toMap
    val snap = latest(ev.filter(_._5).toSeq)
    val inc = latest(ev.filterNot(_._5).toSeq)
    val inserts = inc.keySet.diff(snap.keySet).size.toLong
    val updates = inc.keySet.intersect(snap.keySet)
      .count(k => snap(k) != inc(k)).toLong
    val unchanged = (snap.keySet.diff(inc.keySet).size +
      inc.keySet.intersect(snap.keySet).count(k => snap(k) == inc(k))).toLong
    val row = byName("p184_upsert_merge_audit").run(spark, SharedSpark.sf).head()
    assert(row.getLong(0) == snap.size.toLong)
    assert(row.getLong(1) == inc.size.toLong)
    assert(row.getLong(2) == inserts)
    assert(row.getLong(3) == updates)
    assert(row.getLong(4) == unchanged)
    assert(row.getLong(5) == (snap.keySet ++ inc.keySet).size.toLong)
  }
}
