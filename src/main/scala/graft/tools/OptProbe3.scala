package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry}

/** r19 scratch probe: run one query to completion (noop sink), then print
  * the EXECUTED plan — the post-AQE final plan with AQEShuffleRead
  * coalesced-partition counts and reused exchanges/stages, i.e. the SQL-tab
  * evidence the static `explain` cannot show. Used to verify the
  * AQE-collapse diagnosis on the truth-tier pair streams and the runtime
  * exchange-reuse claims (r18 VERDICT items 3 and 5).
  * Usage: jrun.sh graft.tools.OptProbe3 <dir> <query> [runs]
  */
object OptProbe3 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val n = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession =
      GraftSession.builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
        .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.prepare(spark)
    val fn = SparkEntry.queries(name)
    var last: org.apache.spark.sql.DataFrame = null
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      last = fn(spark, dir)
      last.write.format("noop").mode("overwrite").save()
      println(f"[probe3] $name run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    println(s"========== $name executed plan (post-AQE) ==========")
    println(last.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
