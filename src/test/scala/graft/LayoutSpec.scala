package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.Layout

/** Scale-layout verification: bucketed joins must drop their exchanges,
  * salted joins must agree with plain joins, partitioned writes must prune. */
class LayoutSpec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  test("bucketed join runs with zero shuffle exchanges") {
    val o = Tables.df(spark, SharedSpark.sf, "orders")
    val c = Tables.df(spark, SharedSpark.sf, "customer")
    Layout.writeBucketed(o, "orders_b", "o_custkey", 4)
    Layout.writeBucketed(c.withColumnRenamed("c_custkey", "o_custkey"), "cust_b", "o_custkey", 4)
    val joined = spark.table("orders_b").join(spark.table("cust_b"), "o_custkey")
    // disable broadcast so the join actually exercises co-partitioning
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val n = Layout.countExchanges(
        spark.table("orders_b").join(spark.table("cust_b"), "o_custkey"))
      assert(n == 0, s"expected no exchanges for bucketed join, got $n")
      // and the unbucketed baseline DOES shuffle
      val base = Layout.countExchanges(
        o.join(c, o("o_custkey") === c("c_custkey")))
      assert(base >= 2, s"unbucketed baseline should shuffle both sides, got $base")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
    assert(joined.count() > 0)
  }

  test("salted join equals plain join result") {
    val li = Tables.df(spark, SharedSpark.sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.df(spark, SharedSpark.sf, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, "l_orderkey").count()
    val salted = Layout.saltedJoin(li, o, "l_orderkey", salts = 8).count()
    assert(salted == plain)
  }

  test("partitioned write prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString + "/ev"
    val ev = Tables.df(spark, SharedSpark.sf, "events")
      .withColumn("day", to_date(col("ts")))
    Layout.writePartitioned(ev, dir, Seq("day"))
    val days = ev.select("day").distinct().count()
    val pruned = spark.read.parquet(dir).filter(col("day") === ev.select(min("day")).head().getDate(0))
    val scanned = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }
    assert(days > 1)
    assert(scanned.contains(1), s"expected 1 partition scanned, got $scanned")
  }
}
