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

  test("tier handoff: a frontier crossing driverFrontierCap mid-run stops at exactly maxIter depths") {
    // Frontier triples each depth (1, 3, 9, 27, ...): with cap=8 the loop
    // collect-paces depths 0-1, then the 9-row frontier hands off to the
    // checkpoint tier mid-run. The r12 fix counts the re-derived handoff
    // step against maxIter — without it this walk would emit maxIter+1
    // depths. Pinned output-identical to native WITH RECURSIVE with the
    // same depth guard.
    val tripler = spark.range(3).select(col("id").as("j"))
    def step(f: org.apache.spark.sql.DataFrame) =
      f.crossJoin(tripler)
        .select((col("n") + 1).as("n"), (lit(3L) * col("k") + col("j")).as("k"))

    val base = spark.range(1).select(lit(0).as("n"), lit(0L).as("k"))
    val looped = operators.Recursion.unionAll(
      base, f => step(f.filter(col("n") < 5)),
      maxIter = 5, driverFrontierCap = 8)
      .groupBy(col("n")).agg(count(lit(1)).as("c"), sum(col("k")).as("s"))
      .orderBy(col("n")).collect()

    // exactly maxIter+1 depth levels (seed + maxIter steps), 3^d rows each
    assert(looped.map(_.getInt(0)).toSeq == (0 to 5),
      s"depths emitted: ${looped.map(_.getInt(0)).mkString(",")}")
    assert(looped.map(_.getLong(1)).toSeq == (0 to 5).map(d => math.pow(3, d).toLong))

    val native = spark.sql("""
      WITH RECURSIVE t(n, k) AS (
        SELECT 0 AS n, CAST(0 AS BIGINT) AS k
        UNION ALL
        SELECT t.n + 1, 3 * t.k + j.j
        FROM t CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (1), (2)) AS j(j)
        WHERE t.n < 5)
      SELECT n, count(*) AS c, sum(k) AS s FROM t GROUP BY n ORDER BY n""").collect()
    assert(looped.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq ==
      native.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq)

    // pure-maxIter stop (no natural termination): the handoff step must
    // consume a depth, not grant an extra one — 1+3+9+27 rows, max n = 3
    val capped = operators.Recursion.unionAll(
      base, step, maxIter = 3, driverFrontierCap = 8)
    assert(capped.count() == 40L)
    assert(capped.agg(max(col("n"))).head().getInt(0) == 3)
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
