package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the batch-31 operators beyond the driver gate: the Bloom
  * calibration's probes really are non-members and its theoretical FPR
  * matches the closed form, the novelty profile conserves the distinct-gram
  * ledger, and the Heaps fit is a well-formed sublinear exponent.
  */
class PipelineBatch31Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  test("p119: probes exclude the member source, FPR bounded and closed-form") {
    val rows = byName("p119_bloom_fp_calibration").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (source, nProbes, nFp, empirical, theoretical) =>
      assert(source != "src0", "member source must not appear as a probe arm")
      assert(nFp >= 0 && nFp <= nProbes, s"$source: fp count out of range")
      assert(math.abs(empirical - nFp.toDouble / nProbes) < 1e-6)
      assert(theoretical > 0 && theoretical < 1)
    }
    // theoretical FPR is the same closed form for every source (it depends
    // only on the member count): recompute it independently
    val nMembers = Tables.df(spark, SharedSpark.sf, "documents")
      .filter(col("source") === "src0")
      .select(md5(col("text"))).distinct().count()
    val expect = math.pow(1 - math.pow(1 - 1.0 / 4096, 3.0 * nMembers), 3)
    rows.foreach { case (source, _, _, _, theoretical) =>
      assert(math.abs(theoretical - expect) < 1e-5, s"$source: closed form off")
    }
    // a 3-hash/4096-bit filter at test member counts is far from saturated:
    // the empirical FPR should sit well under 50%
    assert(rows.forall(_._4 < 0.5), "empirical FPR implausibly high")
  }

  test("p120: first doc is fully novel and the distinct-gram ledger conserves") {
    val rows = byName("p120_ngram_novelty").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (doc, nGrams, nNovel, novelty) =>
      assert(nNovel >= 0 && nNovel <= nGrams, s"doc $doc: novel out of range")
      assert(math.abs(novelty - nNovel.toDouble / nGrams) < 1e-6, s"doc $doc")
    }
    val firstDoc = rows.map(_._1).min
    val first = rows.find(_._1 == firstDoc).get
    assert(first._2 == first._3, "lowest doc_id must be 100% novel")
    // every distinct gram in the corpus is novel in exactly one document,
    // so sum(n_novel) == |distinct grams| (docs shorter than the shingle
    // width have no grams and no row — consistent on both sides)
    val distinctGrams = Tables.df(spark, SharedSpark.sf, "documents")
      .select(explode(array_distinct(Functions.wordShingles(
        split(lower(col("text")), "\\s+"), 5))).as("g"))
      .select(col("g")).distinct().count()
    assert(rows.map(_._3).sum == distinctGrams, "novel-gram ledger leak")
  }

  test("p121: ten decile points, sublinear positive Heaps exponent") {
    val rows = byName("p121_heaps_fit").run(spark, SharedSpark.sf).collect()
    assert(rows.length == 1)
    val (n, b, lnk) = (rows(0).getLong(0), rows(0).getDouble(1), rows(0).getDouble(2))
    assert(n == 10, s"expected 10 decile points, got $n")
    assert(b >= 0 && b < 1, s"Heaps exponent must be sublinear, got $b")
    assert(!lnk.isNaN && !lnk.isInfinite)
  }
}
