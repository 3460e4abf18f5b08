package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the batch-27 operators beyond the driver gate: the
  * keep-exactly-once invariant of span removal, containment/Jaccard
  * ordering, repetition-mass positivity, and tercile ordering per lang.
  */
class PipelineBatch27Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  test("p104: every distinct block hash is kept exactly once, corpus-wide") {
    val out = byName("p104_span_keep_first").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    out.foreach { case (id, n, kept, frac) =>
      assert(n > 0 && kept >= 0 && kept <= n, s"doc $id: kept $kept of $n")
      assert(math.abs(frac - kept.toDouble / n) < 1e-6, s"doc $id: frac off")
    }
    // sum of kept blocks == number of distinct block hashes in the corpus
    // (the whole point of keep-first: one survivor per hash, no more, no less)
    val t = split(lower(col("text")), "\\s+")
    val distinctHashes = Tables.df(spark, SharedSpark.sf, "documents")
      .select(col("doc_id"), t.as("t")).filter(size(col("t")) >= 10)
      .select(explode(transform(
        sequence(lit(1), size(col("t")) - 9, lit(10)),
        i => md5(concat_ws(" ", slice(col("t"), i, lit(10)))))).as("h"))
      .agg(countDistinct(col("h"))).head.getLong(0)
    assert(out.map(_._3).sum == distinctHashes,
      s"kept ${out.map(_._3).sum} != distinct $distinctHashes")
  }

  test("p105: containment dominates Jaccard; flag matches the 0.5 level") {
    val rows = byName("p105_containment_dedup").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, cont, jac, missed) =>
      assert(a < b, s"pair ($a,$b) not ordered")
      assert(cont >= 0.6 - 1e-9, s"($a,$b): containment $cont under threshold")
      assert(cont >= jac - 1e-9, s"($a,$b): containment $cont < jaccard $jac")
      assert(cont <= 1.0 + 1e-9 && jac > 0)
      assert((missed == 1) == (jac < 0.5), s"($a,$b): flag $missed vs jac $jac")
    }
  }

  test("p106: char-mass signals are positive and internally consistent") {
    val rows = byName("p106_gopher_repetition").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, total, t2, t3, d5) =>
      assert(total > 0, s"doc $id: empty")
      // the top n-gram exists by construction, so its mass is positive;
      // dup mass is zero iff no 5-gram repeats (valid), never negative
      assert(t2 > 0 && t3 > 0 && d5 >= 0, s"doc $id: ($t2,$t3,$d5)")
      // a single 3-gram occurrence covers more chars than a 2-gram one,
      // but the TOP 2-gram count can exceed the top 3-gram count; only
      // sanity-bound against the overlap-overcount ceiling (×n)
      assert(t2 <= 2.0 + 1e-9 && t3 <= 3.0 + 1e-9 && d5 <= 5.0 + 1e-9)
    }
  }

  test("p107: terciles are ordered and exhaustive per language") {
    val rows = byName("p107_ppl_buckets").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getString(3)))
    assert(rows.nonEmpty)
    assert(rows.forall(r => Set("head", "middle", "tail")(r._4)))
    rows.groupBy(_._2).foreach { case (lang, g) =>
      val byB = g.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
      for {
        lo <- byB.get("tail"); mid <- byB.get("middle")
      } assert(lo.max <= mid.min, s"$lang: tail above middle")
      for {
        mid <- byB.get("middle"); hi <- byB.get("head")
      } assert(mid.max <= hi.min, s"$lang: middle above head")
      // terciles over >=3 docs per lang should populate all three buckets
      if (g.length >= 30)
        assert(byB.keySet == Set("head", "middle", "tail"),
          s"$lang: missing bucket ${byB.keySet}")
    }
  }
}
