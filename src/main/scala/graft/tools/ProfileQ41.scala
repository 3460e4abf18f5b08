package graft.tools
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.ExactPercentile

// scratch profiling harness — not part of the library surface
object ProfileQ41 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def sink(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    val li = Tables.df(spark, dir, "lineitem")
    time("qty_hist_only")(sink(li.groupBy(col("l_returnflag"), col("l_quantity").cast("double").as("__v")).agg(count(lit(1)).as("__c"))))
    time("price_hist_only")(sink(li.groupBy(col("l_returnflag"), col("l_extendedprice").cast("double").as("__v")).agg(count(lit(1)).as("__c"))))
    time("med_qty_full")(sink(ExactPercentile.percentiles(li, "l_returnflag", col("l_quantity"), Seq(0.5 -> "m"))))
    time("p90_refined")(sink(ExactPercentile.refined(li, "l_returnflag", col("l_extendedprice"), Seq(0.9 -> "m"))))
    time("coarse_only")(sink(li.groupBy(col("l_returnflag"), floor(col("l_extendedprice").cast("double") / 100.0).cast("long")).agg(count(lit(1)))))
    time("scan_only")(sink(li.select(col("l_returnflag"), col("l_extendedprice"))))
    time("q41_now")(sink(graft.SparkEntry.queries("q41_agg_extra")(spark, dir)))
    spark.stop()
  }
}
// appended scratch: construction-vs-sink split for the checkpointed q41
object ProfileQ41b {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def sink(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries("q41_agg_extra")(spark, dir)
      val t1 = System.nanoTime()
      sink(df)
      val t2 = System.nanoTime()
      println(f"PROFILEB construct ${(t1 - t0) / 1e9}%.3f sink ${(t2 - t1) / 1e9}%.3f")
    }
    spark.stop()
  }
}
