package graft

import org.scalatest.funsuite.AnyFunSuite

/** Properties of the batch-12 operators beyond the driver gate: the
  * snapshot diff's conservation identity and the z-score's
  * history-gating/self-exclusion semantics.
  */
class PipelineBatch12Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  test("p59: diff classes conserve both snapshots' entity counts") {
    val rows = byName("p59_snapshot_diff").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    import org.apache.spark.sql.functions._
    val docs = Tables.df(spark, SharedSpark.sf, "documents")
    val oldN = docs.filter(col("doc_id") % 2 === 0).count()
    val newN = docs.filter(col("doc_id") % 2 === 1).count()
    // removed + changed + unchanged covers every old-snapshot entity;
    // added + changed + unchanged covers every new-snapshot entity
    assert(rows.map(r => r._3 + r._4 + r._5).sum == oldN,
      "old-snapshot entities not conserved by the diff classes")
    assert(rows.map(r => r._2 + r._4 + r._5).sum == newN,
      "new-snapshot entities not conserved by the diff classes")
    rows.foreach { case (src, a, r, c, u) =>
      assert(a >= 0 && r >= 0 && c >= 0 && u >= 0, s"$src: negative class count")
    }
    // random text makes paired snapshots differ — 'changed' must dominate
    // 'unchanged' on this corpus
    assert(rows.map(_._4).sum > rows.map(_._5).sum,
      "synthetic snapshots report mostly-unchanged — hash comparison suspect")
  }

  test("p60: z-scores gated on history, self-excluded, flags consistent") {
    val rows = byName("p60_rolling_zscore").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getLong(0), r.getDate(1), r.getDouble(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (uid, day, _, hist, z, anomaly) =>
      assert(hist >= 0 && hist <= 7, s"$uid $day: history $hist outside [0,7]")
      if (hist < 3) {
        assert(z.isEmpty, s"$uid $day: score emitted with only $hist days of history")
        assert(!anomaly, s"$uid $day: anomaly flagged without a score")
      } else {
        assert(z.isDefined, s"$uid $day: missing score despite $hist days of history")
        assert(anomaly == (math.abs(z.get) > 2.0), s"$uid $day: flag inconsistent with z")
      }
    }
    // both tails of the detector fire somewhere on a month of data
    assert(rows.exists(_._6), "no anomaly flagged over the full corpus")
    assert(rows.count(r => r._5.isDefined) > rows.length / 2,
      "most rows lack scores — the trailing window never fills")
  }
}
