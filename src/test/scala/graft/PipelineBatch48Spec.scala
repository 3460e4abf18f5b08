package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.math.BigDecimal.RoundingMode

/** Batch-48 differentials: feature hashing, quantile treatment effects,
  * backoff hit rates, Kaplan–Meier survival, code detection, and dedup
  * canonicalization — each re-derived from scratch in plain Scala.
  */
class PipelineBatch48Spec extends AnyFunSuite {
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

  test("p185: collision rates equal the md5-bucket derivation") {
    val words = Tables.df(spark, SharedSpark.sf, "documents")
      .select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split("\\s+", -1))
    val v = words.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val buckets = v.toSeq.groupBy { case (w, _) =>
      java.lang.Long.parseLong(md5hex(w).take(8), 16) % 4096
    }
    val collided = buckets.values.filter(_.size > 1)
    val row = byName("p185_feature_hashing").run(spark, SharedSpark.sf).head()
    assert(row.getLong(0) == v.size.toLong)
    assert(row.getLong(1) == buckets.size.toLong)
    assert(row.getLong(2) == collided.size.toLong)
    assert(row.getDouble(3) ==
      rN(collided.map(_.size).sum.toDouble / v.size, 6))
    assert(row.getDouble(4) ==
      rN(collided.flatMap(_.map(_._2)).sum.toDouble / words.length, 6))
  }

  test("p186: per-decile QTE equals the type-7 per-arm derivation") {
    val a = Tables.df(spark, SharedSpark.sf, "events")
      .select("user_id", "value").collect()
      .map(r => (r.getLong(0) % 2, r.getDouble(1)))
    def q(vs: Seq[Double], f: Double): Double = {
      val s = vs.sorted
      val p = f * (s.length - 1)
      val (fl, ce) = (math.floor(p).toInt, math.ceil(p).toInt)
      s(fl) + (p - fl) * (s(ce) - s(fl))
    }
    val (t, c) = (a.filter(_._1 == 1).map(_._2).toSeq, a.filter(_._1 == 0).map(_._2).toSeq)
    val rows = byName("p186_quantile_treatment_effect").run(spark, SharedSpark.sf)
      .collect()
    assert(rows.length == 9)
    rows.zip(1 to 9).foreach { case (r, i) =>
      val f = i / 10.0
      assert(r.getDouble(0) == f)
      assert(r.getDouble(1) == rN(q(c, f), 4), s"control q$f")
      assert(r.getDouble(2) == rN(q(t, f), 4), s"treatment q$f")
      assert(r.getDouble(3) == rN(q(t, f) - q(c, f), 4), s"qte q$f")
    }
  }

  test("p187: backoff hit rates equal the distinct-gram set derivation") {
    val d = Tables.df(spark, SharedSpark.sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0) % 2, r.getString(1).toLowerCase.split("\\s+", -1)))
    def grams(tk: Array[String], n: Int): Seq[String] =
      if (tk.length < n) Seq.empty
      else (0 to tk.length - n).map(i => tk.slice(i, i + n).mkString(" "))
    val rows = byName("p187_backoff_hitrate").run(spark, SharedSpark.sf).collect()
    (1 to 3).zip(rows).foreach { case (n, r) =>
      val train = d.filter(_._1 == 0).flatMap(t => grams(t._2, n)).toSet
      val held = d.filter(_._1 == 1).flatMap(t => grams(t._2, n))
      val hit = held.count(train)
      assert(r.get(0).toString.toLong == n.toLong)
      assert(r.getLong(1) == held.length.toLong, s"n_grams order $n")
      assert(r.getLong(2) == hit.toLong, s"n_hit order $n")
      assert(r.getDouble(3) == rN(hit.toDouble / held.length, 6))
    }
  }

  test("p188: KM curve equals the product-limit derivation with censoring") {
    val ev = Tables.df(spark, SharedSpark.sf, "events")
      .selectExpr("user_id", "event_type", "cast(ts as string) as t",
        "cast(ts as date) as d").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getDate(3).toLocalDate))
    val subjects = ev.groupBy(_._1).values.flatMap { g =>
      val signup = g.filter(_._2 == "signup").sortBy(_._3).headOption
      signup.map { s0 =>
        // first purchase at-or-after the signup TIMESTAMP; durations in days
        val purchase = g.filter(t => t._2 == "purchase" && t._3 >= s0._3)
          .sortBy(_._3).headOption
        val last = g.maxBy(_._3)
        purchase match {
          case Some(p) => (1L, p._4.toEpochDay - s0._4.toEpochDay)
          case None => (0L, last._4.toEpochDay - s0._4.toEpochDay)
        }
      }
    }.toSeq
    val byDay = subjects.groupBy(_._2).view.mapValues { g =>
      (g.map(_._1).sum, g.size.toLong)
    }.toMap
    val days = byDay.keys.toSeq.sorted
    var logSum = BigDecimal(0)
    var absorbed = false
    val want = days.flatMap { day =>
      val nAtRisk = byDay.filter(_._1 >= day).values.map(_._2).sum
      val d = byDay(day)._1
      if (d == 0) None
      else {
        if (d == nAtRisk) absorbed = true
        else logSum += bd(rN(math.log(1 - d.toDouble / nAtRisk), 9))
        Some((day, d, nAtRisk,
          if (absorbed) 0.0 else rN(math.exp(logSum.toDouble), 6)))
      }
    }
    val rows = byName("p188_km_survival").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == want, s"KM rows: got ${rows.length}, want ${want.length}")
    // survival is monotone non-increasing
    assert(rows.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("p189: code shares equal the regex heuristic derivation") {
    val d = Tables.df(spark, SharedSpark.sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val want = d.groupBy(_._1).map { case (src, docs) =>
      val flags = docs.map { case (_, t) =>
        val len = math.max(t.length, 1)
        val sym = t.count("{}();=<>[]".contains(_)).toDouble / len
        val dig = t.count(_.isDigit).toDouble / len
        val und = t.count(_ == '_').toDouble /
          math.max(t.split("\\s+", -1).length, 1)
        if (sym > 0.02 || und > 0.1 || (sym > 0.01 && dig > 0.1)) 1L else 0L
      }
      src -> (docs.length.toLong, flags.sum, rN(flags.sum.toDouble / docs.length, 6))
    }
    val rows = byName("p189_code_detection").run(spark, SharedSpark.sf).collect()
    assert(rows.map(_.getString(0)).toSeq == want.keys.toSeq.sorted)
    rows.foreach { r =>
      val (n, code, share) = want(r.getString(0))
      assert((r.getLong(1), r.getLong(2)) == ((n, code)), r.getString(0))
      assert(r.getDouble(3) == share)
    }
  }

  test("p190: canonicalization stats equal the keep-best argmax derivation") {
    val d = Tables.df(spark, SharedSpark.sf, "documents")
      .select("doc_id", "n_chars", "text").collect()
      .map { r =>
        val t = r.getString(2).toLowerCase
        (r.getLong(0), md5hex(t),
          rN(t.split("\\s+", -1).length.toDouble / math.max(r.getLong(1), 1L), 6))
      }
    val clusters = d.groupBy(_._2).values.toSeq
    val dup = clusters.filter(_.length > 1)
    val canonSum = dup.map(_.maxBy(t => (t._3, -t._1))._1).sum
    val row = byName("p190_dup_canonicalization").run(spark, SharedSpark.sf).head()
    assert(row.getLong(0) == clusters.size.toLong)
    assert(row.getLong(1) == dup.size.toLong)
    assert(row.getLong(2) == d.length.toLong)
    assert(row.getLong(3) == (d.length - clusters.size).toLong)
    assert(row.getDouble(4) == rN(clusters.size.toDouble / d.length, 6))
    assert(row.getLong(5) == canonSum, "canonical id sum (keep-best argmax)")
  }
}
