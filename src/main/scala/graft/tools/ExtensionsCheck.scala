package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{GreaterThan, LessThanOrEqual}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation}
import org.apache.spark.sql.functions._

/** Asserts the cluster-deployment entry point for the graft optimizer rules:
  * a session built ONLY with `spark.sql.extensions=graft.plans.GraftExtensions`
  * (the `spark-submit --conf` path — reflection-instantiated, no programmatic
  * `extraOptimizations` registration) must compact redundant ranges and plan
  * contradictions as empty relations, exactly like the path
  * PredicateCompactionSpec covers in-process.
  *
  * Exits 0 after printing `EXTCHECK OK`, non-zero with a message otherwise.
  * ExtensionsEntrySpec drives this in a child JVM: `spark.sql.extensions` is
  * a STATIC conf, read from the SparkContext's SparkConf at session build, so
  * it only takes effect on a fresh context — which is also why this is the
  * one graft surface the shared-session test JVM cannot reach directly.
  */
object ExtensionsCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-check")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("ERROR")
      val li = graft.Tables.df(spark, args.headOption.getOrElse("/root/testdata/sf0.001"), "lineitem")

      // redundant bounds merge to the tight (5, 47] pair via the injected rule
      val merged = li.filter(col("l_quantity") > 5 && col("l_quantity") > 3
        && col("l_quantity") <= 47 && col("l_quantity") < 49)
      val conds = merged.queryExecution.optimizedPlan.collect { case f: Filter => f.condition }
      require(conds.size == 1, s"expected one Filter in the optimized plan, got ${conds.size}")
      val cmp = conds.head.collect {
        case g: GreaterThan => ("gt", g.right.toString)
        case l: LessThanOrEqual => ("le", l.right.toString)
      }
      require(cmp.toSet == Set(("gt", "5.0"), ("le", "47.0")),
        s"injected rule did not merge to the tight pair, got $cmp")

      // contradiction collapses to an empty LocalRelation with no file scan
      val contra = li.filter(col("l_quantity") > 40 && col("l_quantity") < 10)
      require(contra.queryExecution.optimizedPlan
        .collectFirst { case l: LocalRelation => l }.isDefined,
        "contradictory range did not collapse to an empty relation")
      require(!contra.queryExecution.executedPlan.toString.contains("Scan parquet"),
        "contradictory filter still schedules a file scan")
      require(contra.count() == 0, "contradiction returned rows")

      println("EXTCHECK OK")
    } finally spark.stop()
  }
}
