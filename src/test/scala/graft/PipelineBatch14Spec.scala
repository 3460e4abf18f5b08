package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the batch-14 operators beyond the driver gate: coverage
  * monotonicity for the vocab curve, ledger/keeper invariants for cluster
  * representatives, clipping-bound sanity for winsorization, cohort
  * conservation for retention, and entropy range laws.
  */
class PipelineBatch14Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  test("p67: coverage is monotone in vocab size and reaches totals consistently") {
    val rows = byName("p67_vocab_coverage").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(100, 300, 1000, 3000))
    val total = rows.head._4
    rows.foreach { case (sz, words, covered, tot, cov) =>
      assert(tot == total, "total_tokens differs between rows")
      assert(words <= sz, s"size $sz: more vocab words than the size allows")
      assert(covered <= tot, s"size $sz: covered exceeds total")
      assert(math.abs(cov - covered.toDouble / tot) < 1e-5, s"size $sz: coverage ratio inconsistent")
    }
    rows.zip(rows.tail).foreach { case ((s1, w1, c1, _, _), (s2, w2, c2, _, _)) =>
      assert(w1 <= w2 && c1 <= c2, s"coverage not monotone from size $s1 to $s2")
    }
  }

  test("p68: ledger covers the corpus; keepers are in-cluster quality argmaxes") {
    val rows = byName("p68_cluster_reps").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getBoolean(4)))
    val corpusN = Tables.df(spark, SharedSpark.sf, "documents").count()
    assert(rows.length == corpusN, "ledger row count != corpus size")
    assert(rows.map(_._1).distinct.length == rows.length, "duplicate doc in ledger")
    rows.groupBy(_._2).foreach { case (comp, rs) =>
      val reps = rs.filter(_._5)
      assert(reps.length == 1, s"component $comp has ${reps.length} keepers")
      val rep = reps.head
      assert(rep._1 == rep._4, s"component $comp: kept row is not its own rep")
      // the keeper's quality is maximal (doc_id breaks ties upward)
      assert(rs.forall(r => r._3 < rep._3 + 1e-12 ||
        (r._3 == rep._3 && r._1 >= rep._1)),
        s"component $comp: keeper is not the quality argmax")
      assert(rs.forall(_._4 == rep._1), s"component $comp: rep_doc inconsistent")
      assert(comp == rs.map(_._1).min, s"component $comp is not the min doc id")
    }
  }

  test("p69: winsorized stats respect the exact clipping bounds") {
    val rows = byName("p69_winsorize").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val evN = Tables.df(spark, SharedSpark.sf, "events").count()
    assert(rows.map(_._2).sum == evN, "per-type counts do not cover the events table")
    rows.foreach { case (et, n, lo, hi, clipped, mean) =>
      assert(lo <= hi, s"$et: p01 > p99")
      assert(mean >= lo - 1e-6 && mean <= hi + 1e-6, s"$et: winsorized mean outside bounds")
      assert(clipped >= 0 && clipped <= n, s"$et: clipped count outside [0, n]")
      // 2% tails on n rows clip at most ~2%·n + interpolation slack
      assert(clipped <= math.ceil(n * 0.02) + 2, s"$et: clips more than the tails allow")
    }
    assert(rows.exists(_._5 > 0), "no event type clips anything — bounds suspect")
  }

  test("p70: cohort matrix conserves users at offset 0 and never exceeds cohort size") {
    val rows = byName("p70_retention_cohorts").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getDate(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val users = Tables.df(spark, SharedSpark.sf, "events")
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(rows.map(_._4).max <= users)
    // every user is active in their own signup week: offset 0 has full retention
    rows.filter(_._2 == 0).foreach { case (cw, _, active, size, ret) =>
      assert(active == size, s"cohort $cw: offset-0 active != cohort size")
      assert(math.abs(ret - 1.0) < 1e-9, s"cohort $cw: offset-0 retention != 1")
    }
    assert(rows.groupBy(_._1).keySet.map(_ => 1).sum >= 1)
    rows.foreach { case (cw, off, active, size, ret) =>
      assert(off >= 0, s"cohort $cw: negative offset")
      assert(active <= size, s"cohort $cw offset $off: active exceeds cohort")
      assert(math.abs(ret - active.toDouble / size) < 1e-5, s"cohort $cw: ratio inconsistent")
    }
    // cohort sizes sum to the distinct-user count
    assert(rows.filter(_._2 == 0).map(_._4).sum == users,
      "offset-0 cohort sizes do not partition the user base")
  }

  test("p71: entropy within [0, ln n]; uniform docs hit the ceiling in normalized form") {
    val rows = byName("p71_token_entropy").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    val corpusN = Tables.df(spark, SharedSpark.sf, "documents").count()
    assert(rows.length == corpusN)
    rows.foreach { case (id, n, h, hn) =>
      assert(h >= -1e-9, s"doc $id: negative entropy")
      assert(h <= math.log(n.toDouble) + 1e-6, s"doc $id: entropy above ln(n) beyond 6dp rounding")
      hn.foreach { x =>
        assert(x >= -1e-9 && x <= 1 + 1e-9, s"doc $id: normalized entropy outside [0,1]")
      }
      if (n > 1) assert(hn.isDefined, s"doc $id: missing normalized entropy")
    }
    // word-soup docs draw near-uniformly from a small vocab: normalized
    // entropy concentrates in the upper band (measured ~0.69-1.0 at sf0.01)
    val highs = rows.flatMap(_._4).count(_ > 0.6)
    assert(highs > rows.length / 2, "most docs should be high-entropy on this corpus")
  }

  test("q92: grouping sets reconcile with per-column aggregates") {
    val rows = byName("q92_grouping_sets").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getInt(2), r.getInt(3), r.getLong(4), r.getDouble(5)))
    val total = rows.filter(r => r._3 == 1 && r._4 == 1)
    assert(total.length == 1, "grand-total row missing or duplicated")
    val bySt = rows.filter(r => r._3 == 0)
    val byPr = rows.filter(r => r._4 == 0 && r._3 == 1)
    assert(bySt.map(_._5).sum == total.head._5, "status set does not conserve row count")
    assert(byPr.map(_._5).sum == total.head._5, "priority set does not conserve row count")
    assert(math.abs(bySt.map(_._6).sum - total.head._6) < 1.0,
      "status set does not conserve the total sum")
    bySt.foreach(r => assert(r._1.isDefined && r._2.isEmpty, "status rows malformed"))
    byPr.foreach(r => assert(r._2.isDefined && r._1.isEmpty, "priority rows malformed"))
  }
}
