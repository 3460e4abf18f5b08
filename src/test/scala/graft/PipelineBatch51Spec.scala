package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.math.BigDecimal.RoundingMode

/** Batch-51 differentials: jackknife influence, SPRT, daily ACF, design
  * effect, dow seasonality, calendar completeness — re-derived in plain
  * Scala at sf0.001.
  */
class PipelineBatch51Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  private def rN(x: Double, n: Int): Double =
    BigDecimal(java.math.BigDecimal.valueOf(x)).setScale(n, RoundingMode.HALF_UP)
      .toDouble

  private def bd9(x: Double): BigDecimal =
    BigDecimal(java.math.BigDecimal.valueOf(x)).setScale(9, RoundingMode.HALF_UP)

  private lazy val events = Tables.df(spark, SharedSpark.sf, "events")
    .selectExpr("event_id", "event_type", "CAST(ts AS DATE) AS d").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getDate(2).toLocalDate))

  private lazy val docs = Tables.df(spark, SharedSpark.sf, "documents")
    .select("doc_id", "text", "source", "n_chars").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("p199: influence equals the closed-form LOO recount and sums near zero") {
    val n = docs.length.toLong
    val ss = docs.map(_._4).sum
    val rows = byName("p199_jackknife_influence").run(spark, SharedSpark.sf).collect()
    val bySrc = docs.groupBy(_._3)
    assert(rows.map(_.getString(0)).toSet == bySrc.keySet)
    rows.foreach { r =>
      val ds = bySrc(r.getString(0))
      val ng = ds.length.toLong
      val sg = ds.map(_._4).sum
      val without = (ss - sg).toDouble / (n - ng)
      assert(r.getLong(1) == ng)
      assert(r.getDouble(3) == rN(without, 6))
      assert(r.getDouble(4) == rN(without - ss.toDouble / n, 6))
    }
    // influences are deviations around the grand mean: they cannot all
    // share a sign
    val infs = rows.map(_.getDouble(4))
    assert(infs.min < 0 && infs.max > 0)
  }

  test("p200: SPRT walk equals the daily recount") {
    val daily = events.groupBy(_._3).toSeq.sortBy(_._1.toString).map {
      case (d, es) => (d, es.length.toLong, es.count(_._2 == "purchase").toLong)
    }
    var cum = BigDecimal(0)
    var firstCross: Option[(String, Double)] = None
    daily.foreach { case (d, n, k) =>
      cum += bd9(k * 0.200670695 + (n - k) * -0.050010421)
      if (firstCross.isEmpty && math.abs(cum.toDouble) > 2.944438979)
        firstCross = Some((d.toString, cum.toDouble))
    }
    val row = byName("p200_sprt_sequential").run(spark, SharedSpark.sf).head()
    assert(row.getLong(0) == daily.length.toLong)
    assert(row.getDouble(1) == rN(cum.toDouble, 6))
    assert(row.getString(2) == firstCross.map(_._1).getOrElse("(none)"))
    val wantDecision = firstCross match {
      case None => "continue"
      case Some((_, v)) if v > 0 => "accept_h1"
      case _ => "accept_h0"
    }
    assert(row.getString(3) == wantDecision)
  }

  test("p201: ACF equals the lagged recount; lag-0 normalization sane") {
    val daily = events.groupBy(_._3).toSeq.sortBy(_._1.toString)
      .map(_._2.length.toLong)
    val mu = daily.sum.toDouble / daily.length
    val den = daily.map(c => bd9((c - mu) * (c - mu))).sum.toDouble
    val rows = byName("p201_daily_autocorrelation").run(spark, SharedSpark.sf)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 7L))
    rows.foreach { r =>
      val lag = r.getLong(0).toInt
      val pairs = daily.drop(lag).zip(daily.dropRight(lag))
      assert(r.getLong(1) == pairs.length.toLong)
      val num = pairs.map { case (c, cp) => bd9((c - mu) * (cp - mu)) }.sum.toDouble
      assert(r.getDouble(2) == rN(num / den, 6), s"lag $lag")
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9)
    }
  }

  test("p202: DEFF equals the sufficient-sum recount") {
    val n = docs.length.toLong
    val sx = docs.map(_._4).sum
    val sxx = docs.map(d => d._4 * d._4).sum
    val varTotal = (sxx.toDouble - sx.toDouble * sx / n) / (n - 1)
    val within = docs.groupBy(_._3).values.map { ds =>
      val ng = ds.length.toLong
      val sg = ds.map(_._4).sum
      val sgg = ds.map(d => d._4 * d._4).sum
      (ng.toDouble / n) * ((sgg.toDouble - sg.toDouble * sg / ng) / (ng - 1))
    }.sum
    val row = byName("p202_design_effect").run(spark, SharedSpark.sf).head()
    assert(row.getLong(0) == n)
    assert(row.getDouble(1) == rN(varTotal, 6))
    assert(math.abs(row.getDouble(2) - within) < 1e-4)
    assert(math.abs(row.getDouble(3) - within / varTotal) < 1e-6)
    assert(row.getDouble(3) > 0.0 && row.getDouble(3) <= 1.5)
  }

  test("p203: dow profile equals the calendar recount; shares sum to 1") {
    val daily = events.groupBy(_._3).toSeq
      .map { case (d, es) => (d.getDayOfWeek.getValue.toLong, es.length.toLong) }
    val rows = byName("p203_dow_seasonality").run(spark, SharedSpark.sf).collect()
    val byDow = daily.groupBy(_._1)
    assert(rows.map(_.getLong(0)).toSet == byDow.keySet)
    val total = daily.map(_._2).sum.toDouble
    rows.foreach { r =>
      val ds = byDow(r.getLong(0))
      assert(r.getLong(1) == ds.length.toLong)
      assert(r.getLong(2) == ds.map(_._2).sum)
      assert(r.getDouble(3) == rN(ds.map(_._2).sum / total, 6))
    }
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    // seasonal strength: identical on every row, in [0, 1]
    val strengths = rows.map(_.getDouble(5)).distinct
    assert(strengths.length == 1)
    assert(strengths.head >= 0.0 && strengths.head <= 1.0)
  }

  test("p204: calendar completeness equals the span recount") {
    val days = events.map(_._3).distinct
    val lo = days.minBy(_.toEpochDay)
    val hi = days.maxBy(_.toEpochDay)
    val cal = Iterator.iterate(lo)(_.plusDays(1)).takeWhile(!_.isAfter(hi)).toSeq
    val expect = cal.groupBy(d => (d.getYear, d.getMonthValue)).view
      .mapValues(_.length).toMap
    val obsDays = days.groupBy(d => (d.getYear, d.getMonthValue)).view
      .mapValues(_.length).toMap
    val rowsPerMonth = events.groupBy(e => (e._3.getYear, e._3.getMonthValue))
      .view.mapValues(_.length.toLong).toMap
    val rows = byName("p204_calendar_completeness").run(spark, SharedSpark.sf)
      .collect()
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val m = r.getDate(0).toLocalDate
      val key = (m.getYear, m.getMonthValue)
      assert(m.getDayOfMonth == 1, "month column must be truncated")
      assert(r.getLong(1) == expect(key).toLong)
      assert(r.getLong(2) == obsDays.getOrElse(key, 0).toLong)
      assert(r.getDouble(3) == rN(
        obsDays.getOrElse(key, 0).toDouble / expect(key), 6))
      assert(r.getLong(4) == rowsPerMonth.getOrElse(key, 0L))
    }
  }
}
