package graft

import org.scalatest.funsuite.AnyFunSuite

/** Properties of the batch-9 pipeline operators beyond the driver gate:
  * blocking-candidate soundness, quartile ordering and Tukey-fence
  * consistency, and hard-negative margin structure.
  */
class PipelineBatch9Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  test("p52: ranked pairs are consistent and every match shares a rare gram") {
    val rows = byName("p52_entity_blocking").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq, "ranks not contiguous")
    val jacs = rows.map(_._6)
    assert(jacs.zip(jacs.tail).forall { case (a, b) => a >= b - 1e-9 },
      s"jaccard increases along ranks: ${jacs.toSeq}")
    rows.foreach { case (rk, ck, sk, inter, uni, jac) =>
      assert(inter >= 1, s"rank $rk: candidate pair ($ck,$sk) shares no gram")
      assert(inter <= uni, s"rank $rk: inter exceeds union")
      assert(jac > 0.0 && jac <= 1.0, s"rank $rk: jaccard $jac outside (0,1]")
      assert(math.abs(jac - inter.toDouble / uni) < 1e-5,
        s"rank $rk: jaccard inconsistent with inter/union")
    }
    // the name grammar shares the 9-digit suffix across tables, so the top
    // match must pair a customer with its same-numbered supplier
    val (_, ck, sk, _, _, _) = rows.head
    assert(ck % 1000000000L == sk % 1000000000L || rows.head._6 > 0.3,
      s"top match ($ck,$sk) is not a strong-suffix pair")
  }

  test("p53: quartiles ordered, fences consistent, docs covered") {
    val rows = byName("p53_length_quantiles").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val total = Tables.df(spark, SharedSpark.sf, "documents").count()
    assert(rows.map(_._2).sum == total, "per-source doc counts do not cover the corpus")
    rows.foreach { case (src, nDocs, q1, med, q3, nOut) =>
      assert(q1 <= med + 1e-9 && med <= q3 + 1e-9, s"$src: quartiles out of order")
      assert(nOut >= 0 && nOut <= nDocs, s"$src: outlier count $nOut outside [0,$nDocs]")
      // Tukey fences at 1.5 IQR can flag at most ~25% of a unimodal
      // distribution's mass on each side; a majority-outlier source means
      // the fence arithmetic diverged
      assert(nOut * 2 <= nDocs, s"$src: $nOut of $nDocs docs flagged as outliers")
    }
  }

  test("p54: positives outrank negatives per query and ids are valid") {
    val rows = byName("p54_hard_negatives").run(spark, SharedSpark.sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (qid, _, posId, posCos, negId, negCos, margin) =>
      assert(qid % 50 == 0, s"query $qid not in the deterministic subset")
      assert(posId != qid && negId != qid, s"query $qid matched itself")
      assert(posId != negId, s"query $qid: positive and negative are the same vector")
      assert(posCos >= -1.0 - 1e-9 && posCos <= 1.0 + 1e-9, s"query $qid: pos_cos $posCos")
      assert(negCos >= -1.0 - 1e-9 && negCos <= 1.0 + 1e-9, s"query $qid: neg_cos $negCos")
      assert(math.abs(margin - (posCos - negCos)) < 1e-5,
        s"query $qid: margin inconsistent")
    }
  }
}
