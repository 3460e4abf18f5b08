package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-shot decomposition of q01_group_agg's isolated floor (r17 VERDICT
  * #4: clean readings spanned 1.75–2.24x the ~0.25 s reference anchor on
  * the r17 container and the 2x binding target is at risk; the judge asked
  * for a MEASURED decomposition — task scheduling vs scan cost vs agg —
  * before any engine-side change). Times five variants in one warmed
  * session, 5 trials each, and reports per-variant medians plus
  * stage/task counts from a listener:
  *
  *   scan_only    — parquet scan of the q01 input columns, noop sink
  *   scan_filter  — + the shipdate filter (pushdown visible in scan time)
  *   partial_agg  — per-partition hash agg only (no exchange): the map side
  *   full_q01     — the gate query exactly as Bench times it
  *   canary       — the pure-compute range canary, for the session floor
  *
  * Dev instrument, not a gate surface — results land in BENCH_NOTES.
  */
object Q01Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)

    @volatile var stages = 0
    @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += sc.stageInfo.numTasks
      }
    })

    val li = graft.Tables.df(spark, sfDir, "lineitem")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val variants: Seq[(String, () => Unit)] = Seq(
      "scan_only" -> (() => noop(li.select(col("l_returnflag"),
        col("l_linestatus"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_shipdate")))),
      "scan_filter" -> (() => noop(li
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax")))),
      "partial_agg" -> (() => noop(li
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(spark_partition_id().as("p"), col("l_returnflag"),
          col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sq"), count(lit(1)).as("c")))),
      "full_q01" -> (() => noop(
        graft.SparkEntry.queries("q01_group_agg")(spark, sfDir))),
      "canary" -> (() => noop(spark.range(0L, 20000000L, 1L, 32)
        .select(sum(col("id") % 7).as("s"), avg(col("id")).as("a"))))
    )

    // warm everything once (codegen/JIT), then 5 timed trials per variant,
    // interleaved like Bench to decorrelate run position
    variants.foreach { case (_, f) => f() }
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    val counts = scala.collection.mutable.Map[String, (Int, Int)]()
    for (pass <- 1 to 5; (name, f) <- variants) {
      val (s0, t0) = (stages, tasks)
      val t = System.nanoTime()
      f()
      times(name) = times(name) :+ (System.nanoTime() - t) / 1e9
      if (pass == 1) counts(name) = (stages - s0, tasks - t0)
    }
    val out = variants.map { case (name, _) =>
      val ts = times(name).sorted
      val (st, tk) = counts(name)
      f""""$name":{"median":${ts(ts.size / 2)}%.4f,"min":${ts.head}%.4f,"stages":$st,"tasks":$tk}"""
    }.mkString("{", ",", "}")
    println(s"""{"probe":"q01_decomposition","sf":"$sfDir","variants":$out}""")
    spark.stop()
  }
}
