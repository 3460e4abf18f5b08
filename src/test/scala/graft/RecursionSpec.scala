package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** operators/Recursion.scala — the driver-paced WITH RECURSIVE strategy —
  * against Spark's native UnionLoop execution: both must produce identical
  * results, and the native SQL surface (which Graft.query passes through)
  * stays pinned here now that q96's gate entry uses the fast strategy.
  */
class RecursionSpec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  test("driver-paced recursion matches native WITH RECURSIVE exactly") {
    val nation = Tables.df(spark, SharedSpark.sf, "nation")
    nation.createOrReplaceTempView("nation_rec_spec")
    val native = spark.sql("""
      WITH RECURSIVE walk(nk, depth) AS (
        SELECT CAST(0 AS BIGINT) AS nk, 0 AS depth
        UNION ALL
        SELECT CAST(n.n_nationkey AS BIGINT), w.depth + 1
        FROM walk w JOIN nation_rec_spec n ON n.n_nationkey = (2 * w.nk + 1) % 25
        WHERE w.depth < 30)
      SELECT nk, depth FROM walk ORDER BY depth, nk""").collect()

    val base = spark.range(1).select(lit(0L).as("nk"), lit(0).as("depth"))
    val looped = operators.Recursion.unionAll(base, frontier =>
      frontier.filter(col("depth") < 30)
        .join(nation, col("n_nationkey") === (lit(2) * col("nk") + 1) % 25)
        .select(col("n_nationkey").cast("long").as("nk"),
          (col("depth") + 1).as("depth")),
      maxIter = 30)
      .orderBy(col("depth"), col("nk")).collect()

    assert(native.length == 31) // seed + 30 steps, one frontier row each
    assert(looped.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      native.map(r => (r.getLong(0), r.getInt(1))).toSeq)
  }

  test("recursion stops at the first empty frontier, before maxIter") {
    val base = spark.range(1).select(lit(0L).as("v"))
    var steps = 0
    val out = operators.Recursion.unionAll(base, f => {
      steps += 1
      f.filter(col("v") < 3).select((col("v") + 1).as("v"))
    }, maxIter = 1000)
    assert(out.collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    assert(steps <= 5, s"step ran $steps times for a depth-4 walk")
  }
}
