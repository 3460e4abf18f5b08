package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface — new capability beyond the reference (which
  * is batch-only; SURVEY.md §2.6). The transforms here are the streaming
  * twins of the batch queries p13/p14 in PipelineQueries: identical logical
  * plans, fed by readStream instead of read.
  *
  * Scale notes: the windowed aggregation is partial-aggregated per
  * micro-batch and state-stored per (window, event_type) key; the watermark
  * bounds state size, which is what makes this viable on an unbounded
  * 100-TB/day stream.
  */
object EventStreams {

  /** On-disk schema of the events table (FIXTURES.md §1). `ts` is stored as
    * TIMESTAMP(NANOS) which Spark reads as long nanos under
    * spark.sql.legacy.parquet.nanosAsLong (see GraftSession). */
  val rawEventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling-window counts/sums with late-data handling via watermark. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").getField("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))

  /** Sliding windows (1h window, 15m slide). */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").getField("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Session windows with a 30-minute gap — the streaming equivalent of the
    * batch sessionization in p14_events_sessions. */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").getField("start").as("session_start"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))

  /** Streaming dedup on event_id within the watermark horizon. */
  def dedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream inner join with time-range condition: each 'view' event
    * matched to 'click' events of the same user within the following hour.
    * Both sides watermarked so join state is bounded (the condition's time
    * bound is what lets Spark expire buffered rows). */
  def streamStreamJoin(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .withWatermark("ts", "1 hour")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
    val clicks = events.filter(col("event_type") === "click")
      .withWatermark("ts", "2 hours")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    views.join(clicks,
      col("v_user") === col("c_user")
        && col("c_ts") >= col("v_ts")
        && col("c_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"))
  }

  /** Custom keyed state via flatMapGroupsWithState: per-user running event
    * count + value sum, emitting an updated row per user per micro-batch.
    * This is the extension point the reference lacks entirely (its engine is
    * batch-only): arbitrary per-key state machines with bounded state. */
  def runningUserTotals(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val typed = events.select(col("user_id"), col("value")).as[(Long, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), (Long, Long, Double)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (user: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var s = s0
          rows.foreach { r => n += 1; s += r._2 }
          state.update((n, s))
          Iterator((user, n, s))
      }
      .toDF("user_id", "n_events", "total_value")
  }

  /** Streaming inter-event gap extraction — the incremental form of p88's
    * lag stage: per-user keyed state carries only the LAST (timestamp,
    * event_id); each arriving event emits its gap to that carried
    * predecessor. Rows are ordered by (ts, event_id) WITHIN each
    * micro-batch (matching the batch lag window's ordering); across
    * batches the file source delivers time-partitioned drops in order —
    * an out-of-order producer would need a watermarked buffer in front,
    * which is an ingest contract, not a plan change. State is O(1) per
    * user — the gap distribution itself stays a downstream aggregation
    * exactly as in batch. */
  def eventGaps(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val typed = events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .as[(Long, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (user: Long, rows: Iterator[(Long, Long, Long)],
              state: GroupState[(Long, Long)]) =>
          val sorted = rows.toSeq.sortBy(r => (r._3, r._2))
          var last = state.getOption // (us, event_id)
          val out = Seq.newBuilder[(Long, Long, Long)]
          sorted.foreach { case (_, eid, us) =>
            last.foreach { case (pus, _) => out += ((user, eid, us - pus)) }
            last = Some((us, eid))
          }
          last.foreach(state.update)
          out.result().iterator
      }
      .toDF("user_id", "event_id", "gap_us")
  }

  /** Streaming rolling z-score anomaly detection — the incremental form of
    * batch p60: per user, maintain day totals in keyed state and score each
    * day against the trailing 7 OBSERVED days (current excluded, matching
    * the batch ROWS frame). State is one decimal per (user, day) — bounded
    * in production by an ingest-time watermark that retires days older than
    * the trailing window (the [[runningUserTotals]] contract).
    *
    * Determinism mirrors the batch twin exactly: day totals accumulate as
    * scale-9 BigDecimals (the batch's DECIMAL(38,9) grid — exact, order-
    * independent), trailing sums and sums-of-squares stay exact decimals,
    * and only the final statistics convert to doubles (BigDecimal's
    * nearest-double conversion == Spark's decimal→double cast), so every
    * emitted score is bit-identical to p60's (pinned in StreamingSpec).
    */
  def rollingZscores(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import java.math.{BigDecimal => JBD, RoundingMode}
    val typed = events
      .select(col("user_id"), col("ts").cast("date").as("day"), col("value"))
      .as[(Long, java.sql.Date, Double)]
    def round6(x: Double): Double =
      JBD.valueOf(x).setScale(6, RoundingMode.HALF_UP).doubleValue
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[Map[Long, JBD],
        (Long, java.sql.Date, Double, Long, Option[Double], Boolean)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user, rows, state: GroupState[Map[Long, JBD]]) =>
          var days = state.getOption.getOrElse(Map.empty[Long, JBD])
          rows.foreach { case (_, d, v) =>
            val k = d.toLocalDate.toEpochDay
            val g = JBD.valueOf(v).setScale(9, RoundingMode.HALF_UP)
            days = days.updated(k, days.get(k).map(_.add(g)).getOrElse(g))
          }
          state.update(days)
          val ordered = days.toSeq.sortBy(_._1)
          ordered.zipWithIndex.iterator.map { case ((epochDay, v), i) =>
            val trail = ordered.slice(math.max(0, i - 7), i).map(_._2)
            val n = trail.length.toLong
            // flag on the UNROUNDED score (the batch twin's coalesce(abs(zs)
            // > 2) runs before its round(zs, 6)), emit the rounded one
            val zRaw =
              if (n >= 3) {
                val s1 = trail.reduce(_.add(_))
                val s2 = trail.map(x => x.multiply(x)).reduce(_.add(_))
                val (vd, s1d, s2d) = (v.doubleValue, s1.doubleValue, s2.doubleValue)
                Some((vd - s1d / n) / math.sqrt((s2d - s1d * s1d / n) / (n - 1)))
              } else None
            (user, java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(epochDay)),
              round6(v.doubleValue), n, zRaw.map(round6),
              zRaw.exists(zz => math.abs(zz) > 2.0))
          }
      }
      .toDF("user_id", "day", "v_day", "hist_days", "z", "anomaly")
  }

  /** Read the events table as a bounded stream (used by tests; in production
    * the source would be kafka/files arriving continuously). Watermarks
    * require TIMESTAMP (with local tz), not NTZ — with the session pinned to
    * UTC the wall-clock values are identical.
    *
    * Timestamp precision is probed from the files, mirroring Tables.df's
    * conditional: TIMESTAMP(NANOS) parquet surfaces as long nanos (under
    * spark.sql.legacy.parquet.nanosAsLong) and is truncated to µs;
    * micro-precision files surface as a native timestamp and pass through.
    * The testdata has shipped BOTH precisions across rounds — a fixed
    * nanos assumption silently mis-dates µs files by 1000x. */
  def readEventStream(spark: SparkSession, eventsDir: String): DataFrame = {
    val tsType = spark.read.parquet(eventsDir).schema("ts").dataType
    val schema = StructType(rawEventSchema.map {
      case f if f.name == "ts" => f.copy(dataType = tsType)
      case f => f
    })
    val raw = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(eventsDir)
    tsType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
}
