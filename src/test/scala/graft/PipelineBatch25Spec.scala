package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the batch-25 operator beyond the driver gate: the data
  * map's marginal sums must reproduce both 1-D decile partitions.
  */
class PipelineBatch25Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  test("p101: cells partition the corpus and marginals are sane") {
    val rows = byName("p101_data_map").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val corpusN = Tables.df(spark, SharedSpark.sf, "documents").count()
    assert(rows.map(_._3).sum == corpusN, "cells do not partition the corpus")
    rows.foreach { case (ld, qq, n, sumScore) =>
      assert(ld >= 1 && ld <= 10 && qq >= 1 && qq <= 5, s"cell ($ld,$qq) out of range")
      assert(n > 0, s"cell ($ld,$qq): empty cell emitted")
      assert(sumScore >= 0 && sumScore <= n.toDouble, "score mass outside [0, n]")
    }
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length, "duplicate cell")
    // mean score per quintile (marginal over length) must be nondecreasing
    val byQ = rows.groupBy(_._2).map { case (q, g) =>
      q -> g.map(_._4).sum / g.map(_._3).sum
    }.toSeq.sortBy(_._1)
    byQ.zip(byQ.tail).foreach { case ((q1, a1), (q2, a2)) =>
      assert(a2 >= a1 - 1e-9, s"quality quintile $q2 mean below quintile $q1")
    }
  }
}
