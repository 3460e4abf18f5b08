package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.math.BigDecimal.RoundingMode

/** Batch-40 differentials: the HRW placement (incl. the churn law), the
  * retention simulation, and the watermark audit each re-derived from
  * scratch in plain Scala and compared cell-for-cell.
  */
class PipelineBatch40Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  private def rN(x: Double, n: Int): Double =
    BigDecimal(java.math.BigDecimal.valueOf(x)).setScale(n, RoundingMode.HALF_UP)
      .toDouble

  private def md5u60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  test("p146: HRW table equals the from-scratch placement and obeys the churn law") {
    val ids = Tables.df(spark, SharedSpark.sf, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val placed = ids.map { id =>
      val hs = (0 until 64).map(sh => sh -> md5u60(s"${id}_s$sh"))
      val (shard, best) = hs.maxBy(_._2)
      (shard, if (md5u60(s"${id}_s64") > best) 1 else 0)
    }
    val n = ids.length.toLong
    val expected = placed.groupBy(_._1).toSeq.sortBy(_._1).map { case (sh, g) =>
      (sh, g.length.toLong, rN(g.length.toDouble * 64 / n, 6),
        g.map(_._2).sum.toLong, rN(g.map(_._2).sum.toDouble / g.length, 6))
    }
    val got = byName("p146_hrw_shards").run(spark, SharedSpark.sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == expected, s"HRW mismatch:\n got ${got.take(5)}...\nwant ${expected.take(5)}...")
    assert(got.map(_._2).sum == n, "placement must cover every doc")
    // churn law: a 65th shard steals ~1/65 of the corpus (loose 3x band)
    val movedShare = got.map(_._4).sum.toDouble / n
    assert(movedShare > 0 && movedShare < 3.0 / 65,
      s"churn $movedShare outside the rendezvous bound band")
  }

  test("p147: retention table equals the from-scratch last-K + window simulation") {
    val ev = Tables.df(spark, SharedSpark.sf, "events")
      .selectExpr("event_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS tus",
        "user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val cutoff = ev.map(_._2).max - 7L * 86400 * 1000000
    val ranked = ev.groupBy(_._3).values.flatMap { g =>
      g.sortBy(e => (-e._2, e._1))
        .zipWithIndex.map { case (e, i) => (e._4, e._2, i + 1) }
    }
    val expected = ranked.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, g) =>
      val lastK = g.count(_._3 <= 5)
      val window = g.count(x => x._3 > 5 && x._2 >= cutoff)
      val evicted = g.size - lastK - window
      (et, lastK.toLong, window.toLong, evicted.toLong,
        rN(evicted.toDouble / g.size, 6))
    }
    val got = byName("p147_retention_policy").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got == expected, s"retention mismatch:\n got $got\nwant $expected")
  }

  test("p148: watermark audit equals the from-scratch running-max disorder scan") {
    val ev = Tables.df(spark, SharedSpark.sf, "events")
      .selectExpr("event_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS tus",
        "user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val lates = ev.groupBy(x => (x._4, x._3)).values.flatMap { g =>
      val sorted = g.sortBy(_._1)
      var runMx = Long.MinValue
      sorted.map { e =>
        val late = runMx != Long.MinValue && e._2 < runMx
        val lateUs = if (late) runMx - e._2 else 0L
        runMx = math.max(runMx, e._2)
        (e._4, late, lateUs)
      }
    }.toSeq
    val expected = lates.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, g) =>
      val nLate = g.count(_._2).toLong
      val sumUs = g.map(_._3).sum
      (et, g.size.toLong, nLate, rN(nLate.toDouble / g.size, 6),
        math.floor(g.map(_._3).max.toDouble / 1000000).toLong,
        if (nLate > 0) Some(rN(sumUs.toDouble / nLate / 1000000, 6)) else None)
    }
    val got = byName("p148_watermark_audit").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toSeq
    assert(got == expected, s"watermark mismatch:\n got $got\nwant $expected")
  }
}
