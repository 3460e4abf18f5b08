package graft

import org.scalatest.funsuite.AnyFunSuite

/** Properties of the batch-57 operators beyond the driver gate: chain-rule
  * and bounds identities for the entropy pair, Chao1 ≥ V_obs, Theil–Sen
  * robustness shape, CCF symmetry-of-inputs checks, moment recomputes, and
  * Hellinger's metric bounds — with FixtureVacuity probes throughout.
  */
class PipelineBatch57Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get
  private def df(n: String) = byName(n).run(spark, SharedSpark.sf)
  private def run(n: String) = df(n).collect()

  private lazy val docs: Seq[(String, String, Long)] =
    Tables.df(spark, SharedSpark.sf, "documents")
      .select("text", "lang", "n_chars").collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))

  test("p235: entropy chain rule holds and H(w2|w1) <= H(w1,w2)") {
    val rows = run("p235_conditional_entropy").map(r => (r.getString(0),
      r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, n, hj, hf, hc) =>
      assert(n > 0, lang)
      // hc rounds the UNROUNDED difference; hj/hf round independently, so
      // the reconstruction can differ by one 6dp ulp
      assert(math.abs(hc - math.rint((hj - hf) * 1e6) / 1e6) < 1.01e-6, lang)
      assert(hc >= 0 && hc <= hj + 1e-9, s"$lang: conditioning reduces entropy")
      assert(hf > 0, s"$lang: first-word marginal must vary")
    }
    // recompute one language end to end
    val (lang, n0, hj0, _, _) = rows.head
    val bgs = docs.filter(_._2 == lang).flatMap { d =>
      val t = d._1.toLowerCase.split("\\s+")
      t.sliding(2).filter(_.length == 2).map(_.mkString(" "))
    }
    val freq = bgs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = freq.values.sum
    assert(n0 == n)
    val clnc = freq.values.map(c =>
      math.rint(c * math.log(c.toDouble) * 1e9) / 1e9).sum
    val myHj = math.log(n.toDouble) - clnc / n
    assert(math.abs(hj0 - math.rint(myHj * 1e6) / 1e6) < 1e-5, s"$hj0 vs $myHj")
    FixtureVacuity.assertDiscriminates(df("p235_conditional_entropy"), "h_cond", 3)
  }

  test("p236: Chao1 >= observed richness, with the exact estimator value") {
    val rows = run("p236_chao1_richness").map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    rows.foreach { case (lang, v, n1, n2, chao) =>
      assert(chao >= v - 1e-9, s"$lang: Chao1 can only add unseen types")
      val expect = if (n2 > 0) v + n1.toDouble * n1 / (2.0 * n2)
        else v + n1.toDouble * (n1 - 1) / 2.0
      assert(math.abs(chao - math.rint(expect * 1e6) / 1e6) < 1e-9, lang)
      assert(n1 > 0, s"$lang: the bigram spectrum must keep a singleton head")
    }
    FixtureVacuity.assertDiscriminates(df("p236_chao1_richness"), "chao1", 3)
  }

  test("p237: Theil-Sen slope is the median of all pairwise day slopes") {
    val r = run("p237_theil_sen").head
    val (nPairs, slope) = (r.getLong(0), r.getDouble(1))
    val daily = Tables.df(spark, SharedSpark.sf, "events")
      .selectExpr("cast(ts as date) as d").groupBy("d").count()
      .collect().map(x => (x.getDate(0).toLocalDate.toEpochDay, x.getLong(1)))
      .sortBy(_._1)
    val slopes = (for {
      i <- daily.indices; j <- (i + 1) until daily.length
    } yield (daily(j)._2.toDouble - daily(i)._2) /
        (daily(j)._1 - daily(i)._1)).sorted
    assert(nPairs == slopes.length)
    val med = if (slopes.length % 2 == 1) slopes(slopes.length / 2)
      else (slopes(slopes.length / 2 - 1) + slopes(slopes.length / 2)) / 2.0
    assert(math.abs(slope - math.rint(med * 1e6) / 1e6) < 1e-9, s"$slope vs $med")
  }

  test("p238: CCF is a valid correlation at every lag and lag 0 is present") {
    val rows = run("p238_lead_lag_ccf").map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == Seq(-3L, -2L, -1L, 0L, 1L, 2L, 3L))
    rows.foreach { case (lag, n, cr) =>
      assert(n > 0 && cr >= -1 - 1e-9 && cr <= 1 + 1e-9, s"lag $lag: $cr")
    }
    // overlap shrinks by |lag| days
    val n0 = rows.find(_._1 == 0L).get._2
    rows.foreach { case (lag, n, _) => assert(n == n0 - math.abs(lag)) }
    FixtureVacuity.assertDiscriminates(df("p238_lead_lag_ccf"), "ccf_r", 4)
  }

  test("p239: moments match a plain recompute; corrections behave") {
    val rows = run("p239_shape_moments").map(r => (r.getString(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    val bySrc = Tables.df(spark, SharedSpark.sf, "documents")
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1).toDouble)).groupBy(_._1)
    rows.foreach { case (src, n, sd, g1, adjG1, g2, adjG2) =>
      val xs = bySrc(src).map(_._2)
      assert(n == xs.length)
      val m1 = xs.sum / n
      def cm(k: Int) = xs.map(x => math.pow(x - m1, k)).sum / n
      val (m2, m3, m4) = (cm(2), cm(3), cm(4))
      assert(math.abs(sd - math.sqrt(m2)) < 1e-3, src)
      assert(math.abs(g1 - m3 / math.pow(m2, 1.5)) < 1e-4, src)
      assert(math.abs(g2 - (m4 / (m2 * m2) - 3)) < 1e-4, src)
      // the sample corrections scale g1 away from zero and are finite
      assert(math.abs(adjG1) >= math.abs(g1) - 1e-9, src)
      assert(!adjG2.isNaN && !adjG2.isInfinite, src)
    }
    FixtureVacuity.assertDiscriminates(df("p239_shape_moments"), "skew_g1_pop", 5)
  }

  test("p240: Hellinger sits in [0,1], BC in (0,1], and drift discriminates") {
    val rows = run("p240_hellinger_drift").map(r =>
      (r.getString(0), r.getDouble(1), r.getDouble(2)))
    rows.foreach { case (src, bc, h) =>
      assert(bc > 0 && bc <= 1 + 1e-9, s"$src: $bc")
      assert(h >= 0 && h <= 1, s"$src: $h")
      assert(math.abs(h - math.rint(math.sqrt(math.max(1 - bc, 0)) * 1e6) / 1e6)
        < 1e-5, src)
    }
    assert(rows.exists(_._3 > 0), "some source must drift from the corpus")
    FixtureVacuity.assertDiscriminates(df("p240_hellinger_drift"), "hellinger", 5)
  }
}
