package graft

import org.scalatest.funsuite.AnyFunSuite

/** Properties of the batch-8 pipeline operators beyond the driver gate:
  * PMI report structure, k-means cover/validity, weighted-sample
  * determinism and feasibility, boilerplate accounting identities,
  * overlap-matrix bounds, and the quantization error's half-step bound.
  */
class PipelineBatch8Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  test("p46: ranks contiguous, PMI non-increasing, counts above threshold") {
    val rows = byName("p46_pmi_collocations").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq, "ranks not contiguous")
    val pmis = rows.map(_._5)
    // report is ranked on the 1e-9 grid; the printed 1e-6 rounding can only
    // merge neighbors, never reorder them
    assert(pmis.zip(pmis.tail).forall { case (a, b) => a >= b - 1e-9 },
      s"PMI increases along ranks: ${pmis.toSeq}")
    rows.foreach { case (rk, a, b, cab, pmi) =>
      assert(a.nonEmpty && b.nonEmpty, s"rank $rk: empty token")
      assert(cab >= 5, s"rank $rk: pair count $cab below threshold")
      assert(!pmi.isNaN && !pmi.isInfinite && math.abs(pmi) < 10.0,
        s"rank $rk: implausible PMI $pmi")
    }
  }

  test("p47: clusters cover every vector with valid cosine stats") {
    val rows = byName("p47_kmeans_embeddings").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val total = Tables.df(spark, SharedSpark.sf, "embeddings").count()
    assert(rows.map(_._2).sum == total, "cluster sizes do not cover every vector")
    assert(rows.map(_._1).toSet.subsetOf((0 until 4).toSet), "cluster id out of range")
    assert(rows.length >= 2, "k-means collapsed to a single cluster")
    rows.foreach { case (cid, n, avg, min) =>
      assert(n > 0)
      assert(min >= -1.0 - 1e-9 && min <= 1.0 + 1e-9, s"cluster $cid: min_cos $min")
      assert(avg >= min - 1e-9 && avg <= 1.0 + 1e-9, s"cluster $cid: avg_cos $avg")
    }
  }

  test("p48: exactly k per source, negative priorities, repeatable") {
    def run() = byName("p48_weighted_sample").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val rows = run()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, g) =>
      assert(g.map(_._2).sorted.toSeq == (1L to g.length).toSeq,
        s"$src: ranks not contiguous")
      assert(g.length == 5, s"$src: expected 5 sampled docs, got ${g.length}")
      assert(g.map(_._3).distinct.length == g.length, s"$src: duplicate doc sampled")
    }
    // ln(u) < 0 and w > 0 => every Efraimidis–Spirakis priority is negative
    assert(rows.forall(_._5 < 0.0), "non-negative priority")
    // determinism: the sample is a pure function of the data — no RNG state
    assert(run().toSeq == rows.toSeq, "weighted sample not repeatable")
  }

  test("p49: boilerplate accounting identities hold per source") {
    val rows = byName("p49_boilerplate_segments").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, nDist, nInst, bDist, bInst, frac) =>
      assert(nInst >= nDist, s"$src: fewer instances than distinct segments")
      assert(bDist <= nDist && bInst <= nInst, s"$src: boilerplate exceeds totals")
      // df >= 2 => every boilerplate segment has at least 2 instances
      assert(bInst >= 2 * bDist, s"$src: boiler_inst $bInst < 2*boiler_distinct $bDist")
      assert(frac >= 0.0 && frac <= 1.0, s"$src: boiler_frac $frac outside [0,1]")
      assert(math.abs(frac - bInst.toDouble / nInst) < 1e-5,
        s"$src: boiler_frac inconsistent with counts")
    }
  }

  test("p50: overlap rows are consistent and ranked non-increasing") {
    val rows = byName("p50_source_overlap").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq, "ranks not contiguous")
    val jacs = rows.map(_._6)
    assert(jacs.zip(jacs.tail).forall { case (a, b) => a >= b - 1e-9 },
      s"jaccard increases along ranks: ${jacs.toSeq}")
    rows.foreach { case (rk, a, b, inter, uni, jac) =>
      assert(a < b, s"rank $rk: pair not canonically ordered")
      assert(inter >= 1 && inter <= uni, s"rank $rk: inter/union inconsistent")
      assert(jac > 0.0 && jac <= 1.0, s"rank $rk: jaccard $jac outside (0,1]")
      assert(math.abs(jac - inter.toDouble / uni) < 1e-5,
        s"rank $rk: jaccard inconsistent with inter/union")
    }
  }

  test("p51: reconstruction error bounded by the per-dim half step") {
    val rows = byName("p51_embed_quantize").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val total = Tables.df(spark, SharedSpark.sf, "embeddings").count()
    assert(rows.map(_._2).sum == total, "labels do not cover every vector")
    // widest per-dimension range across the table bounds every step size
    import org.apache.spark.sql.functions._
    val widest = Tables.df(spark, SharedSpark.sf, "embeddings")
      .select(posexplode(col("embedding")))
      .groupBy(col("pos"))
      .agg((max(col("col").cast("double")) - min(col("col").cast("double"))).as("d"))
      .agg(max(col("d"))).head().getDouble(0)
    val halfStep = widest / 255.0 / 2.0
    rows.foreach { case (label, nVecs, nVals, mse, maxErr) =>
      assert(nVals == nVecs * 64, s"label $label: n_vals $nVals != 64 * $nVecs")
      assert(mse >= 0.0 && !mse.isNaN, s"label $label: invalid mse $mse")
      // floor(x+0.5) quantization => |err| <= step/2 (+ rounding slack)
      assert(maxErr <= halfStep + 1e-6,
        s"label $label: max_abs_err $maxErr exceeds half step $halfStep")
      assert(mse <= maxErr * maxErr + 1e-9, s"label $label: mse above max_err^2")
    }
  }
}
