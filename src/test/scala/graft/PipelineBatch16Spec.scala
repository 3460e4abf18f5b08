package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the batch-16 operators beyond the driver gate: recall
  * bounds for ANN evaluation, ledger conservation for the blocklist
  * screen, AND-amplification monotonicity for band tuning, and digit/
  * partition laws for RFM segmentation.
  */
class PipelineBatch16Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  test("p75: one row per query, recall in [0,1], and the index finds signal") {
    val rows = byName("p75_ann_recall").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 5, "expected one recall row per query")
    assert(rows.map(_._1).toSeq.sorted == Seq(0L, 1L, 2L, 3L, 4L))
    rows.foreach { case (q, hits, rec) =>
      assert(hits >= 0 && hits <= 5, s"q$q: hits outside [0,5]")
      assert(math.abs(rec - hits / 5.0) < 1e-9, s"q$q: recall inconsistent with hits")
    }
    assert(rows.map(_._2).sum > 0, "IVF recalled nothing — probe path suspect")
  }

  test("p76: drop reasons partition each language's documents") {
    val rows = byName("p76_blocklist_screen").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val corpusN = Tables.df(spark, SharedSpark.sf, "documents").count()
    assert(rows.map(_._2).sum == corpusN)
    rows.foreach { case (lang, n, src, phr, kept) =>
      assert(src + phr + kept == n, s"$lang: drop reasons do not partition the docs")
    }
    assert(rows.map(_._3).sum > 0, "source blocklist never fired")
    assert(rows.map(_._5).sum > 0, "screen kept nothing")
  }

  test("p77: more rows per band → fewer candidates, never lower precision here") {
    val rows = byName("p77_band_tuning").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .sortBy(_._2)
    assert(rows.map(r => (r._1, r._2)).toSeq == Seq((8, 1), (4, 2), (2, 4)))
    rows.foreach { case (nb, r, pairs, truePairs, prec) =>
      assert(truePairs <= pairs, s"($nb,$r): more true pairs than pairs")
      prec.foreach(p => assert(p >= 0 && p <= 1, s"($nb,$r): precision outside [0,1]"))
    }
    rows.zip(rows.tail).foreach { case ((_, r1, p1, _, _), (_, r2, p2, _, _)) =>
      assert(p2 <= p1, s"candidates increased from $r1 to $r2 rows per band")
    }
  }

  test("p78: RFM codes are valid digit triples partitioning the user base") {
    val rows = byName("p78_rfm_segments").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val users = Tables.df(spark, SharedSpark.sf, "events")
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(rows.map(_._2).sum == users, "segments do not partition the user base")
    assert(rows.map(_._1).distinct.length == rows.length, "duplicate segment code")
    rows.foreach { case (code, n, avgMon) =>
      val (r, f, m) = (code / 100, code / 10 % 10, code % 10)
      assert(Seq(r, f, m).forall(d => d >= 1 && d <= 4), s"code $code: digit outside 1..4")
      assert(n > 0, s"code $code: empty segment emitted")
      assert(avgMon >= 0, s"code $code: negative monetary")
    }
    // quartile scoring must spread users across at least a handful of segments
    assert(rows.length >= 4, "quartile scoring collapsed to too few segments")
  }
}
