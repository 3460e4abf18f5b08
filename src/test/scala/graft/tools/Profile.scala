package graft.tools
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

// scratch profiling harness — not part of the library surface
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val li = Tables.df(spark, dir, "lineitem")
    val fil = li.filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
    def g = fil.groupBy(col("l_returnflag"), col("l_linestatus"))
    def sink(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    time("scan_count")(sink(fil.select(col("l_quantity"))))
    time("agg_count_only")(sink(g.agg(count(lit(1)))))
    time("agg_dec38")(sink(g.agg(
      sum(col("l_quantity").cast("decimal(38,6)")).cast("double"),
      sum(col("l_extendedprice").cast("decimal(38,6)")).cast("double"),
      sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(38,6)")).cast("double"))))
    time("agg_dec18")(sink(g.agg(
      sum(col("l_quantity").cast("decimal(18,6)")).cast("double"),
      sum(col("l_extendedprice").cast("decimal(18,6)")).cast("double"),
      sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,6)")).cast("double"))))
    time("agg_double")(sink(g.agg(
      sum(col("l_quantity")), sum(col("l_extendedprice")),
      sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))))
    time("agg_full_q01_dec38")(sink(g.agg(
      sum(col("l_quantity").cast("decimal(38,6)")).cast("double"),
      sum(col("l_extendedprice").cast("decimal(38,6)")).cast("double"),
      sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(38,6)")).cast("double"),
      round(avg(col("l_quantity")), 4), round(avg(col("l_discount")), 4),
      count(lit(1))).orderBy(col("l_returnflag"), col("l_linestatus")))
    )

    time("agg_fixedpoint")(sink(g.agg(
      sum(bround(col("l_quantity")).cast("long")).cast("double"),
      (sum(bround(col("l_extendedprice") * 100).cast("long")) / 100.0),
      (sum(bround(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000).cast("long")) / 10000.0))))
    // value parity: fixed-point vs decimal paths must agree bit-for-bit
    val a = g.agg(
      sum(col("l_quantity").cast("decimal(38,6)")).cast("double").as("s1"),
      sum(col("l_extendedprice").cast("decimal(38,6)")).cast("double").as("s2"),
      sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(38,6)")).cast("double").as("s3"))
      .orderBy("l_returnflag", "l_linestatus").collect()
    val b = g.agg(
      sum(bround(col("l_quantity")).cast("long")).cast("double").as("s1"),
      (sum(bround(col("l_extendedprice") * 100).cast("long")) / 100.0).as("s2"),
      (sum(bround(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000).cast("long")) / 10000.0).as("s3"))
      .orderBy("l_returnflag", "l_linestatus").collect()
    println("PARITY " + (a.toSeq == b.toSeq) + " " + a.head + " vs " + b.head)

    time("agg_fixedpoint2")(sink(g.agg(
      sum((col("l_quantity") + 0.5).cast("long")).cast("double"),
      (sum((col("l_extendedprice") * 100 + 0.5).cast("long")) / 100.0),
      (sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000 + 0.5).cast("long")) / 10000.0))))
    val c2 = g.agg(
      sum((col("l_quantity") + 0.5).cast("long")).cast("double").as("s1"),
      (sum((col("l_extendedprice") * 100 + 0.5).cast("long")) / 100.0).as("s2"),
      (sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000 + 0.5).cast("long")) / 10000.0).as("s3"))
      .orderBy("l_returnflag", "l_linestatus").collect()
    println("PARITY2 " + (a.toSeq == c2.toSeq) + " " + c2.head)
    println("lineitem schema: " + li.schema.simpleString)
    spark.stop()
  }
}
