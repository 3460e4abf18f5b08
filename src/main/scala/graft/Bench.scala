package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)
    // Warm the session (JVM/codegen/FS) so timings measure query work, not
    // startup — matches how the reference's ClickBench harness loops
    // statements inside one session (BASELINE.md note).
    SparkEntry.queries.headOption.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // SPARK_GRAFT_ONLY=q01,q02 restricts the run (local iteration tool)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (k, _) => only.exists(k.startsWith) }
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      // Warm-query timing (BASELINE.md): one untimed pass per query absorbs
      // Janino whole-stage-codegen compilation and JIT — one-time costs the
      // reference's precompiled kernels never pay per statement, and exactly
      // what its ClickBench harness amortizes by looping statements inside a
      // session. Then MEDIAN of `trials` timed passes: a single timed pass
      // proved noise-bound (round 3: one GC pause read as a phantom 3.9x
      // regression); the median of 3 is robust to one outlier pause.
      // noop sink forces full materialization of every column (count() would
      // let Catalyst prune the projections we mean to measure).
      // A failed query records -1, never its time-until-throw — a broken
      // query must not read as a fast success in the bench JSON.
      def once(): Boolean =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case _: Throwable => false }
      val warmOk = once()
      val times = if (!warmOk) Seq.empty[Double] else (1 to trials).flatMap { _ =>
        val t0 = System.nanoTime()
        if (once()) Some((System.nanoTime() - t0) / 1e9) else None
      }
      val median =
        if (times.size < trials) -1.0
        else times.sorted.apply(times.size / 2)
      name -> median
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val errs = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir","trials":$trials}"""
    // Full artifact on disk: the driver's tail-capture truncates the stdout
    // line, so rounds could not be compared query-by-query without this.
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_full.json"),
      json.getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println(json)
    spark.stop()
  }
}
