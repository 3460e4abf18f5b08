package graft

import org.apache.spark.sql.SparkSession

/** One session for the whole test JVM (sbt forks a single JVM for tests). */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder(master = "local[8]", shufflePartitions = 8)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    GraftSession.prepare(s)
  }
  val sf: String = "/root/testdata/sf0.001"
}
