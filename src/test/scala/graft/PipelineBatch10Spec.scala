package graft

import org.scalatest.funsuite.AnyFunSuite

/** Properties of the batch-10 operators beyond the driver gate: the
  * simhash-block audit's sweep-table identities (and the pigeonhole
  * completeness it relies on) and the PQ codebook's cover/coherence.
  */
class PipelineBatch10Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  test("p55: sweep table identities — cumulative sums, monotone recall, bounded rates") {
    val rows = byName("p55_dedup_audit").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    assert(rows.map(_._1).forall(h => h >= 0 && h <= 3), "hamming radius outside [0,3]")
    var (cc, ct) = (0L, 0L)
    rows.foreach { case (ham, nCand, nTrue, cumCand, cumTp, prec, rec) =>
      cc += nCand; ct += nTrue
      assert(cumCand == cc, s"ham $ham: cum_cand $cumCand != running sum $cc")
      assert(cumTp == ct, s"ham $ham: cum_tp $cumTp != running sum $ct")
      assert(nTrue <= nCand, s"ham $ham: more true pairs than candidates")
      assert(prec > 0.0 && prec <= 1.0, s"ham $ham: precision $prec outside (0,1]")
      assert(rec >= 0.0 && rec <= 1.0, s"ham $ham: recall $rec outside [0,1]")
      assert(math.abs(prec - cumTp.toDouble / cumCand) < 1e-5,
        s"ham $ham: precision inconsistent with cum counts")
    }
    val recalls = rows.map(_._7)
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a - 1e-9 },
      s"recall not monotone along the radius sweep: ${recalls.toSeq}")
    // the corpus's duplicate structure gives strong near-dups; the d<=3
    // block tier must find a non-trivial share of them
    assert(recalls.last > 0.3, s"recall ${recalls.last} at ham<=3 implausibly low")
  }

  test("p55: block equality is pigeonhole-complete for hamming <= 3") {
    // independent re-derivation: any two 32-bit words within hamming
    // distance 3 share at least one of the four 8-bit blocks, so every
    // truth pair with ham(simhash) <= 3 MUST appear among candidates —
    // verify on the actual simhash values
    import org.apache.spark.sql.functions._
    val sim = Tables.df(spark, SharedSpark.sf, "documents")
      .select(col("doc_id"), Functions.simhash32(
        split(lower(col("text")), "\\s+")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byBlock = sim.flatMap { case (id, h) =>
      (0 until 4).map(b => ((b, (h >> (b * 8)) & 255L), id))
    }.groupBy(_._1).values.map(_.map(_._2).toSet)
    val candidate = byBlock.flatMap(s =>
      for (a <- s; b <- s if a < b) yield (a, b)).toSet
    for {
      (i, hi) <- sim; (jd, hj) <- sim if i < jd
      if java.lang.Long.bitCount(hi ^ hj) <= 3
    } assert(candidate.contains((i, jd)),
      s"pair ($i,$jd) within hamming 3 missed by block join — pigeonhole broken")
  }

  test("p56: codebook covers every subvector and cells are non-degenerate") {
    val rows = byName("p56_product_quantization").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val total = Tables.df(spark, SharedSpark.sf, "embeddings").count()
    assert(rows.map(_._3).sum == total * 4, "cells do not cover all subvectors")
    assert(rows.map(_._1).toSet.subsetOf((0 until 4).toSet), "subspace id out of range")
    assert(rows.map(_._2).toSet.subsetOf((0 until 4).toSet), "code id out of range")
    (0 until 4).foreach { sub =>
      val cells = rows.filter(_._1 == sub)
      assert(cells.length >= 2, s"subspace $sub collapsed to one cell")
      assert(cells.map(_._3).sum == total, s"subspace $sub does not cover every vector")
    }
    rows.foreach { case (sub, code, n, avg, min) =>
      assert(n > 0)
      assert(min >= -1.0 - 1e-9 && min <= 1.0 + 1e-9, s"($sub,$code): min_cos $min")
      assert(avg >= min - 1e-9 && avg <= 1.0 + 1e-9, s"($sub,$code): avg_cos $avg")
    }
  }
}
