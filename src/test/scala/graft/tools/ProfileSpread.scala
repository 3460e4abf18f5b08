package graft.tools
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

object ProfileSpread {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def sink(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    val docs = Tables.df(spark, dir, "documents")
    println("scan partitions: " + docs.rdd.getNumPartitions)
    def time(name: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"SPREAD $name ${ts.min}%.3f s (${ts.map(t => f"$t%.2f").mkString(",")})")
    }
    time("p02_asis")(sink(graft.SparkEntry.queries("p02_dedup_minhash")(spark, dir)))
    time("p17_asis")(sink(graft.SparkEntry.queries("p17_dedup_jaccard_capped")(spark, dir)))
    time("p20_asis")(sink(graft.SparkEntry.queries("p20_contamination")(spark, dir)))
    spark.stop()
  }
}
