package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.math.BigDecimal.RoundingMode

/** Properties of the batch-35 evaluation operators beyond the driver gate:
  * the NB confusion matrix matches a from-scratch Scala reimplementation of
  * the same smoothed model, the reliability diagram's bins are internally
  * consistent, and the grouped Mann–Whitney AUC equals the brute-force
  * pairwise definition.
  */
class PipelineBatch35Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  private val EnStops = Set("the", "of", "and", "to", "a", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by")

  private def docs(): Array[(Long, String, Array[String])] =
    Tables.df(spark, SharedSpark.sf, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.split("\\s+", -1)))

  /** Spark's round(): BigDecimal.valueOf (shortest decimal repr), HALF_UP. */
  private def r6(x: Double): BigDecimal =
    BigDecimal(java.math.BigDecimal.valueOf(x)).setScale(6, RoundingMode.HALF_UP)

  test("p131: confusion matrix equals a from-scratch NB reimplementation") {
    val all = docs()
    val (test, train) = all.partition(_._1 % 5 == 0)
    // train: smoothed multinomial counts, exactly the op's conventions
    val cnt = scala.collection.mutable.Map.empty[(String, String), Long]
    val tC = scala.collection.mutable.Map.empty[String, Long]
    val dC = scala.collection.mutable.Map.empty[String, Long]
    train.foreach { case (_, lang, ws) =>
      dC(lang) = dC.getOrElse(lang, 0L) + 1
      ws.foreach { w =>
        cnt((w, lang)) = cnt.getOrElse((w, lang), 0L) + 1
        tC(lang) = tC.getOrElse(lang, 0L) + 1
      }
    }
    val v = cnt.keys.map(_._1).toSet.size
    val dAll = train.length.toLong
    val langs = tC.keys.toSeq.sorted
    val expected = scala.collection.mutable.Map.empty[(String, String), Long]
    test.foreach { case (_, trueLang, ws) =>
      val scored = langs.map { c =>
        val sHit = ws.iterator.flatMap(w => cnt.get((w, c)))
          .map(n => r6(math.log(n.toDouble + 1))).sum
        val prior = r6(math.log(dC(c).toDouble / dAll))
        val lt = r6(r6(math.log((tC(c) + v).toDouble)).toDouble * ws.length)
        c -> (sHit + prior - lt)
      }
      val pred = scored.minBy { case (c, s) => (-s, c) }._1
      expected((trueLang, pred)) = expected.getOrElse((trueLang, pred), 0L) + 1
    }
    val got = byName("p131_naive_bayes").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected.toMap,
      s"op confusion $got != reimplementation ${expected.toMap}")
    // structural: the matrix accounts every held-out doc, per true language
    // (no separation assert: the synthetic corpus draws text and lang
    // independently, so chance-level accuracy is the CORRECT readout here —
    // the evaluation op's job is to reveal that, not to hide it)
    assert(got.values.sum == test.length.toLong)
    val perLang = test.groupBy(_._2).map { case (l, d) => l -> d.length.toLong }
    got.groupBy(_._1._1).foreach { case (l, m) =>
      assert(m.values.sum == perLang(l), s"row sum for $l")
    }
  }

  test("p132: reliability bins are consistent and cover the corpus") {
    val rows = byName("p132_score_calibration").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._2).sum == docs().length.toLong)
    rows.foreach { case (b, n, conf, acc, gap) =>
      assert(b >= 0 && b <= 19 && n > 0)
      assert(acc >= 0.0 && acc <= 1.0)
      // mean confidence must sit inside its own bin (19 absorbs the tail)
      assert(conf >= b * 0.05 - 1e-6 &&
        (b == 19 || conf <= (b + 1) * 0.05 + 1e-6),
        s"bucket $b mean confidence $conf outside [{${b * 0.05}, ${(b + 1) * 0.05})")
      assert(math.abs(gap - math.abs(conf - acc)) < 1e-6)
    }
  }

  test("p133: grouped Mann-Whitney AUC equals the brute-force pair definition") {
    val row = byName("p133_roc_auc").run(spark, SharedSpark.sf).head()
    val (nPos, nNeg, auc, gini) =
      (row.getLong(0), row.getLong(1), row.getDouble(2), row.getDouble(3))
    // brute force: P(s_pos > s_neg) + 0.5 P(s_pos = s_neg) over all pairs,
    // on the same 4dp-quantized score
    val scored = docs().map { case (_, lang, ws) =>
      val q = BigDecimal(java.math.BigDecimal.valueOf(
          ws.count(EnStops.contains).toDouble / ws.length))
        .setScale(4, RoundingMode.HALF_UP).toDouble
      (lang == "en", q)
    }
    val pos = scored.filter(_._1).map(_._2)
    val neg = scored.filterNot(_._1).map(_._2)
    assert(nPos == pos.length.toLong && nNeg == neg.length.toLong)
    var mass = 0.0
    pos.foreach { p =>
      neg.foreach { n =>
        if (p > n) mass += 1.0 else if (p == n) mass += 0.5
      }
    }
    val bruteAuc = mass / (pos.length.toDouble * neg.length)
    assert(math.abs(auc - bruteAuc) < 1e-6, s"op AUC $auc != brute $bruteAuc")
    assert(math.abs(gini - (2 * auc - 1)) < 1e-6)
    // chance-level is the truthful readout on this corpus (text and lang are
    // drawn independently) — demand only the definitional range
    assert(auc >= 0.0 && auc <= 1.0)
  }
}
