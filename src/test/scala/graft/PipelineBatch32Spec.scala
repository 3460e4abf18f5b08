package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the batch-32 operators beyond the driver gate: fertility
  * ratios are internally consistent with their integer numerators, the
  * normalization-impact ledger conserves (norm digests can only merge
  * exact-digest classes, never split them), and kappa is a well-formed
  * agreement coefficient consistent with its own contingency counts.
  */
class PipelineBatch32Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  test("p122: fertility and bytes/token recompute from the integer sums") {
    val rows = byName("p122_tokenizer_fertility").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, sub, words, bytes, fert, bpt) =>
      assert(sub >= words, s"$src: subword count under word count")
      assert(math.abs(fert - sub.toDouble / words) < 1e-6, s"$src fertility")
      assert(math.abs(bpt - bytes.toDouble / sub) < 1e-6, s"$src bytes/token")
      assert(fert >= 1.0 && bpt >= 1.0, s"$src: ratios below identity floor")
    }
  }

  test("p123: normalization can only merge duplicate classes, never split") {
    val rows = byName("p123_normalization_impact").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, de, dn, gain) =>
      assert(de >= 0 && de <= n, s"$src: exact dup mass out of range")
      assert(dn >= de, s"$src: norm dedup found FEWER dups than exact")
      assert(gain == dn - de, s"$src: gain ledger mismatch")
    }
    // cross-check one source against an independent computation
    val (src, _, de, dn, _) = rows.maxBy(_._2)
    val docs = Tables.df(spark, SharedSpark.sf, "documents")
      .filter(col("source") === src)
    val n = docs.count()
    val exact = docs.select(md5(col("text"))).distinct().count()
    val norm = docs.select(md5(trim(regexp_replace(regexp_replace(
      lower(col("text")), "[^a-z0-9 ]", ""), "\\s+", " ")))).distinct().count()
    assert(de == n - exact && dn == n - norm, s"$src: independent recount differs")
  }

  test("p124: kappa is consistent with its contingency row and bounded") {
    val rows = byName("p124_annotator_agreement").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getDouble(6))))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, n, a, b, c, d, kappa) =>
      assert(a + b + c + d == n, s"$lang: contingency does not sum to n")
      val po = (a + d).toDouble / n
      val pe = ((a + b) * (a + c) + (c + d) * (b + d)).toDouble / (n.toDouble * n)
      kappa match {
        case Some(k) =>
          assert(math.abs(k - (po - pe) / (1 - pe)) < 1e-6, s"$lang kappa")
          assert(k >= -1.0 - 1e-9 && k <= 1.0 + 1e-9, s"$lang kappa out of range")
        case None =>
          assert(math.abs(1 - pe) < 1e-12, s"$lang: NULL kappa but pe != 1")
      }
    }
  }
}
