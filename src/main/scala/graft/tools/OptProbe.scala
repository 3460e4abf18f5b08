package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry}

/** r18 optimization probe: time one query end-to-end N times with the noop
  * sink (same action as Bench) and print per-run seconds — a scratch
  * instrument for isolating planning-vs-execution cost while iterating.
  * Usage: jrun.sh graft.tools.OptProbe <dir> <query> [n]
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val n = if (args.length > 2) args(2).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession =
      GraftSession.builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
        .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.prepare(spark)
    val fn = SparkEntry.queries(name)
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[probe] $name run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
