package graft.tools
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

// scratch: does spreading single-row-group relational scans pay?
object ProfileSpread2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def sink(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"SPREAD2 $name ${ts.min}%.3f s (${ts.map(t => f"$t%.2f").mkString(",")})")
    }
    val li = Tables.df(spark, dir, "lineitem")
    val liS = Tables.dfSpread(spark, dir, "lineitem")
    val ev = Tables.df(spark, dir, "events")
    val evS = Tables.dfSpread(spark, dir, "events")
    println("lineitem parts: " + li.rdd.getNumPartitions + " events parts: " + ev.rdd.getNumPartitions)
    def q01(d: org.apache.spark.sql.DataFrame) = d
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), sum(col("l_extendedprice")).as("sum_price"),
        avg(col("l_discount")).as("avg_disc"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
    time("q01_asis")(sink(q01(li)))
    time("q01_spread")(sink(q01(liS)))
    def q53(d: org.apache.spark.sql.DataFrame) = d
      .select(col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType)).as("m"))
      .select(col("event_id"),
        array_join(sort_array(map_keys(col("m"))), "|").as("keys"),
        col("m")("k").isNotNull.as("has_k"),
        (col("m")("k").cast("long") % 10).as("k_mod"))
      .orderBy(col("event_id"))
    time("q53_asis")(sink(q53(ev)))
    time("q53_spread")(sink(q53(evS)))
    spark.stop()
  }
}
