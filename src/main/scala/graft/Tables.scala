package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table resolution for the driver testdata layout (`<dir>/<name>.parquet`).
  *
  * The reference resolves zero-config path tables (`FROM 'file.parquet'`) and
  * prefix-routed connectors (reference: opteryx/connectors/__init__.py:95-103);
  * on Spark the same surface is `spark.read.<format>` + temp views. Parquet
  * scans get column pruning + predicate pushdown + row-group pruning from
  * Catalyst for free (the reference hand-rolls this in
  * opteryx/utils/file_decoders.py:218-360).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Memoized per (session, dir, name): a DataFrame is an immutable plan, and
  // re-running `spark.read.parquet` for every QueryDef construction fired a
  // redundant schema-inference JOB per read — hundreds across a Verify pass,
  // and the reason plan-only consumers (PlanAudit) paid cluster time
  // (round-4 ADVICE). Two assumptions this trades on, fine for the
  // bench/verify processes but load-bearing for any longer-lived embedder:
  // (1) the parquet files under `dir` are IMMUTABLE for the session's
  // lifetime — a file replaced mid-session keeps serving the stale cached
  // plan/file listing; (2) sessions live as long as the JVM — entries are
  // never evicted, so a stopped session's analyzed plans stay pinned. An
  // embedder cycling many sessions should clear entries on session stop
  // (or key weakly on the session).
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def df(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, dir, name), { _ =>
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      // Normalize nano-precision timestamps (read as long nanos under
      // spark.sql.legacy.parquet.nanosAsLong) to µs TIMESTAMP_NTZ — same
      // truncation DuckDB applies, so oracle comparisons line up.
      raw.schema.fields.collect {
        case f if f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType => f.name
      }.foldLeft(raw) { (d, c) =>
        d.withColumn(c, org.apache.spark.sql.functions.expr(s"cast(timestamp_micros($c div 1000) as timestamp_ntz)"))
      }
    })

  private val spreadCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  /** [[df]] repartitioned to the session's core count WHEN the parquet scan
    * yields fewer splits — for CPU-heavy per-row kernels (minhash, shingle
    * explosion, n-gram hashing, all-pairs probes) whose map stage otherwise
    * runs on however many row groups the file happens to have (the testdata
    * documents/embeddings files are single-row-group, i.e. ONE core of 32).
    * The condition makes it a no-op at real scale: a 100 TB input has
    * thousands of splits, so no shuffle is ever added there, while the
    * local small-file shuffle moves only a few MB. Memoized like [[df]] so
    * the partition-count planning pass runs once per (session, dir, name).
    */
  def dfSpread(spark: SparkSession, dir: String, name: String): DataFrame =
    spreadCache.computeIfAbsent((spark, dir, name), { _ =>
      val base = df(spark, dir, name)
      val cores = spark.sparkContext.defaultParallelism
      if (base.rdd.getNumPartitions < cores) base.repartition(cores) else base
    })

  /** Register every testdata table as a temp view so `spark.sql` and the
    * DuckDB oracle address tables by the same names. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => df(spark, dir, n).createOrReplaceTempView(n))
}
