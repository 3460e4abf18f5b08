package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BandedThetaJoin
import org.apache.spark.sql.functions._

/** The banded decomposition must equal the nested-loop theta join on
  * arbitrary data — including NULL values (round-4 ADVICE: NULLs must not
  * be folded into the "strictly below" cumsum), negative values (floor
  * banding below zero), and band-boundary values. */
class BandedThetaJoinSpec extends AnyFunSuite {
  private val spark = SharedSpark.spark
  import spark.implicits._

  private def check(sup: Seq[(Long, java.lang.Double)], cust: Seq[java.lang.Double],
      bandW: Double): Unit = {
    val keyed = sup.toDF("k", "v")
    val other = cust.map(Tuple1(_)).toDF("w")
    val banded = BandedThetaJoin.poorerCount(keyed, other, "k", "v", "w", bandW)
      .orderBy(col("k")).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val nlj = keyed.join(other, col("v") > col("w"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_poorer"))
      .orderBy(col("k")).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(banded == nlj, s"banded=$banded nlj=$nlj (bandW=$bandW)")
  }

  test("NULLs on both sides join nothing (ADVICE case)") {
    check(
      sup = Seq((1L, 2500.0), (2L, null), (3L, 100.0)),
      cust = Seq(2000.0, null, 50.0, null, 2499.9),
      bandW = 1000.0)
  }

  test("negative values and band boundaries") {
    check(
      sup = Seq((1L, -1000.0), (2L, 0.0), (3L, 1000.0), (4L, 999.999)),
      cust = Seq(-1000.0, -0.5, 0.0, 999.999, 1000.0),
      bandW = 1000.0)
  }

  test("all-NULL other side yields empty result") {
    check(sup = Seq((1L, 5.0)), cust = Seq(null, null), bandW = 10.0)
  }

  test("random fuzz across band widths") {
    val rnd = new scala.util.Random(42)
    val sup = (1L to 60L).map(i =>
      (i, if (rnd.nextInt(10) == 0) null
          else java.lang.Double.valueOf(rnd.nextInt(10000) - 5000 + rnd.nextDouble())))
    val cust = (1 to 200).map(_ =>
      if (rnd.nextInt(10) == 0) null
      else java.lang.Double.valueOf(rnd.nextInt(10000) - 5000 + rnd.nextDouble()))
    Seq(1.0, 137.0, 1000.0, 100000.0).foreach(w => check(sup, cust, w))
  }
}
