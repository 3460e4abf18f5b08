package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregation — the cardinality/quantile tooling a
  * 100-TB pipeline uses where exact answers don't fit (beyond the reference,
  * which has only exact aggregates + APPROXIMATE_MEDIAN). All built on
  * Spark's native implementations (HLL++ / Datasketches HLL / KLL-style
  * quantiles), i.e. mergeable across partitions with bounded state.
  */
class SketchSpec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private lazy val li = Tables.df(spark, SharedSpark.sf, "lineitem")

  test("approx_count_distinct within 2% of exact") {
    val exact = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"), 0.01)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.02, s"approx=$approx exact=$exact")
  }

  test("datasketches HLL: mergeable across groups") {
    val perFlag = li.groupBy(col("l_returnflag"))
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
    val merged = perFlag.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est")).head().getLong(0)
    val exact = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"merged HLL=$merged exact=$exact")
  }

  test("approx_percentile brackets the exact percentile") {
    val exact = li.select(expr("percentile(l_quantity, 0.5)")).head().getDouble(0)
    val approx = li.select(
      percentile_approx(col("l_quantity"), lit(0.5), lit(1000))).head().getDouble(0)
    assert(math.abs(approx - exact) <= 1.0, s"approx=$approx exact=$exact")
  }

  test("count_min_sketch estimates heavy-hitter frequency") {
    val sketch = li.select(
      count_min_sketch(col("l_returnflag"), lit(0.01), lit(0.99), lit(42)).as("cms"))
    assert(sketch.head().get(0) != null)
  }

  /** Distinct md5-hash grams per source — the input domain of the KMV
    * aggregate (mirrors p38's shingle stage). */
  private lazy val grams = {
    val t = Tables.df(spark, SharedSpark.sf, "documents")
      .select(col("source"), split(lower(col("text")), "\\s+").as("tk"))
      .filter(size(col("tk")) >= 3)
    t.select(col("source"),
      explode(transform(sequence(lit(1L), (size(col("tk")) - 2).cast("long")),
        i => md5(concat_ws(" ", slice(col("tk"), i.cast("int"), lit(3)))))).as("g"))
      .distinct()
  }

  test("kmv aggregate is partition-invariant (mergeable) and matches the gate estimator") {
    def estimates(parts: Int): Map[String, Double] =
      grams.repartition(parts)
        .groupBy(col("source")).agg(Functions.kmvEst(col("g")).as("est"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val one = estimates(1)
    val many = estimates(13)
    assert(one == many, "KMV estimate depends on partitioning — merge is broken")
    val gate = SparkEntry.allDefs.find(_.name == "p38_kmv_distinct").get
      .run(spark, SharedSpark.sf)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(one.keySet == gate.keySet)
    gate.foreach { case (src, est) =>
      assert(math.rint(one(src) * 1e4) / 1e4 == est,
        s"$src: aggregate est ${one(src)} != gate est $est")
    }
  }

  test("kmv aggregate is registered in SQL and returns -1 under k distinct inputs") {
    Tables.registerAll(spark, SharedSpark.sf)
    val sql = spark.sql(
      """SELECT source, kmv_est(g) AS est FROM (
        |  SELECT DISTINCT source, md5(CAST(doc_id % 10 AS STRING)) AS g
        |  FROM documents) GROUP BY source""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // only 10 distinct hashes per source < k=64 => estimate undefined
    assert(sql.nonEmpty && sql.values.forall(_ == -1.0),
      s"under-k groups must return -1: $sql")
  }
}
