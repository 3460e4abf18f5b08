package graft

import org.scalatest.funsuite.AnyFunSuite

/** Properties of the batch-11 event-feature operators beyond the driver
  * gate: grid density/contiguity and fill correctness for the resampler,
  * and funnel monotonicity.
  */
class PipelineBatch11Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  test("p57: per-user grid is contiguous and dense, fills carry real values") {
    val rows = byName("p57_resample_ffill").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getLong(0), r.getDate(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (uid, g) =>
      val days = g.map(_._2.toLocalDate).sortBy(_.toEpochDay)
      // grid spans first..last day with no holes
      assert(days.last.toEpochDay - days.head.toEpochDay + 1 == g.length,
        s"user $uid: grid has holes (${g.length} rows over ${days.head}..${days.last})")
      assert(days.distinct.length == days.length, s"user $uid: duplicate grid day")
      // the first grid day is an observation day by construction
      val first = g.minBy(_._2.toLocalDate.toEpochDay)
      assert(!first._4, s"user $uid: first grid day marked as filled")
    }
    // every row (filled or not) carries a concrete value
    assert(rows.forall(r => !r._3.isNaN), "a forward-filled value is NaN")
    // the corpus has gaps to fill — otherwise the op tests nothing
    assert(rows.exists(_._4), "no filled rows — grid never had a gap")
    // a filled day's value equals the most recent unfilled day's value
    rows.groupBy(_._1).foreach { case (uid, g) =>
      val byDay = g.sortBy(_._2.toLocalDate.toEpochDay)
      var lastReal = Double.NaN
      byDay.foreach { case (_, d, v, filled) =>
        if (!filled) lastReal = v
        else assert(v == lastReal, s"user $uid $d: fill $v != last observation $lastReal")
      }
    }
  }

  test("p58: funnel stages are ordered, reach shrinks, rates consistent") {
    val rows = byName("p58_funnel").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L), "expected exactly stages 1..3")
    val reach = rows.map(_._3)
    assert(reach.zip(reach.tail).forall { case (a, b) => b <= a },
      s"funnel reach grows downstream: ${reach.toSeq}")
    assert(reach.forall(_ > 0), "a funnel stage is empty — data lost its signal")
    rows.foreach { case (stage, _, n, conv, hrs) =>
      assert(conv > 0.0 && conv <= 1.0, s"stage $stage: conversion $conv outside (0,1]")
      if (stage == 1L) assert(hrs == 0.0, "stage 1 latency must be zero")
      else assert(hrs > 0.0, s"stage $stage: non-positive mean latency $hrs")
    }
    // ordering constraint actually binds: stage-3 latency measured from the
    // funnel start must be at least the stage-2 mean's floor of 0
    assert(rows(2)._5 >= 0.0)
  }
}
