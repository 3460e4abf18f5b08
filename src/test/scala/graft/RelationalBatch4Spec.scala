package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the relational batch-4 operators beyond the driver gate:
  * reshape arithmetic for UNPIVOT, frame-membership laws for the time-range
  * window, and walk accounting for the recursive CTE.
  */
class RelationalBatch4Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  test("q94: unpivot emits one row per (part, measure) and no shuffle") {
    val df = byName("q94_unpivot").run(spark, SharedSpark.sf)
    val nParts = Tables.df(spark, SharedSpark.sf, "part").count()
    assert(df.count() == 2 * nParts)
    val perMeasure = df.groupBy(col("measure")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perMeasure == Map("size" -> nParts, "retailprice" -> nParts))
    // wide→long is map-only: the sort for ORDER BY is the only exchange
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"),
      "unpivot should not hash-shuffle — Expand is map-side")
  }

  test("q95: every event is inside its own frame; frame sums bound the partition sum") {
    val rows = byName("q95_window_time_range").run(spark, SharedSpark.sf)
    assert(rows.filter(col("n_1h") < 1).isEmpty,
      "an event missing from its own 1h frame")
    // the rolling 1h count can never exceed the user's total event count
    val ev = Tables.df(spark, SharedSpark.sf, "events")
    val joined = rows
      .join(ev.select(col("event_id"), col("user_id")), "event_id")
      .join(ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_user")), "user_id")
    assert(joined.filter(col("n_1h") > col("n_user")).isEmpty)
    // and at least one user has >1 event inside an hour on this corpus
    assert(rows.filter(col("n_1h") > 1).count() > 0,
      "no rolling window ever saw 2 events — frame suspect")
  }

  test("q98: native multi-agg pivot is one aggregation pass with no join") {
    val df = byName("q98_pivot_multi_agg").run(spark, SharedSpark.sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "pivot must not plan a join")
    val rows = df.collect()
    assert(rows.length ==
      Tables.df(spark, SharedSpark.sf, "customer")
        .select(countDistinct(col("c_nationkey"))).head().getLong(0))
    // count cells are never NULL (coalesced); sums may be
    rows.foreach(r => assert(!r.isNullAt(1) && !r.isNullAt(3)))
  }

  test("q99: native session windows account for every event, consistent with p14") {
    val rows = byName("q99_session_window").run(spark, SharedSpark.sf)
    val ev = Tables.df(spark, SharedSpark.sf, "events")
    assert(rows.agg(sum(col("n_events"))).head().getLong(0) == ev.count(),
      "sessions do not partition the event stream")
    // per-user session counts from the native operator vs the manual p14
    // islands (p14 uses a strict > gap; the native end bound is exclusive,
    // i.e. >= — counts can only differ where an exact 30:00.000000 gap
    // exists, which the µs-grained generator never produces)
    val native = rows.groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val manual = byName("p14_events_sessions").run(spark, SharedSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == manual, "native session_window diverges from the island spelling")
  }

  test("q100: rank-family laws hold under ties") {
    val rows = byName("q100_rank_family").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getAs[Number](1).longValue, r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6), r.getInt(7)))
    rows.foreach { case (nation, rk, drk, prk, cd, nt) =>
      assert(drk <= rk, s"nation $nation: dense_rank above rank")
      assert(prk >= 0 && prk <= 1 && cd > 0 && cd <= 1)
      assert(nt >= 1 && nt <= 4)
    }
    // within a partition: dense ranks form a contiguous 1..k range, and
    // ntile buckets differ in size by at most 1
    rows.groupBy(_._1).foreach { case (nation, g) =>
      val dr = g.map(_._3).distinct.sorted
      assert(dr.toSeq == (1L to dr.max).toSeq,
        s"nation $nation: dense ranks not contiguous")
      val sizes = g.groupBy(_._6).map(_._2.length)
      assert(sizes.max - sizes.min <= 1, s"nation $nation: ntile imbalance > 1")
    }
  }

  test("q101: LOCF fills only from observed values and lag default fires") {
    val df = byName("q101_ignore_nulls_window").run(spark, SharedSpark.sf)
    val ev = Tables.df(spark, SharedSpark.sf, "events")
    assert(df.count() == ev.count(), "one output row per event expected")
    // the observed value domain is non-negative here, so a filled value can
    // never be negative; the lag default (-1.0) must appear somewhere
    assert(df.filter(col("locf") < 0).isEmpty, "LOCF invented a negative value")
    assert(df.filter(col("lag2") === -1.0).count() > 0, "lag default never fired")
    // nulls survive only before a user's first observation
    val nullLocf = df.filter(col("locf").isNull).count()
    val errorEvents = ev.filter(col("event_type") === "error").count()
    assert(nullLocf <= errorEvents, "more unfilled rows than null observations")
  }

  test("q96: the 30-step walk accounts for all 31 visits and starts at node 0") {
    val rows = byName("q96_recursive_cte").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.map(_._3).sum == 31, "depth-capped walk must emit exactly 31 visits")
    val byNode = rows.map(r => r._1 -> r._2).toMap
    assert(byNode(0L) == 0, "walk must start at nation 0 with depth 0")
    // first_depth values are distinct for the pre-cycle prefix: the walk is
    // a function iteration, so two nodes cannot be first-reached at the
    // same depth
    val depths = rows.map(_._2)
    assert(depths.distinct.length == depths.length,
      "functional-graph walk first-reached two nodes at one depth")
    // replay the walk in Scala and compare the reached set exactly
    val expected = Iterator.iterate(0L)(n => (2 * n + 1) % 25).take(31).toSeq
    assert(rows.map(_._1).toSet == expected.toSet, "reached set diverges from succ replay")
  }
}
