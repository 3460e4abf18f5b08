package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Built-in `$`-prefixed sample/introspection relations (reference:
  * opteryx/virtual_datasets/__init__.py:13-24 — $planets, $satellites,
  * $astronauts, $missions, $no_table, $variables, $statistics, $user,
  * $stop_words).
  *
  * Spark unquoted identifiers exclude `$`, so [[graft.GraftSql]] rewrites
  * `$name` → `graft_virtual_name`; this object registers those views.
  * $planets and $stop_words carry real public data (planetary fact sheet
  * values; standard English stop words); $satellites/$astronauts/$missions
  * are deterministic synthetic stand-ins with the reference's schemas —
  * the capability under test is virtual-relation routing, not astronomy.
  */
object VirtualDatasets {

  val prefix = "graft_virtual_"

  def register(spark: SparkSession): Unit = {
    import spark.implicits._

    // Planetary fact-sheet data (public: NASA planetary fact sheet).
    Seq(
      (1, "Mercury", 0.33, 4879.0, 5427.0, 3.7, 4.3, 1407.6, 4222.6, 57.9, 88.0, 0.0, 0),
      (2, "Venus", 4.87, 12104.0, 5243.0, 8.9, 10.4, -5832.5, 2802.0, 108.2, 224.7, 92.0, 0),
      (3, "Earth", 5.97, 12756.0, 5514.0, 9.8, 11.2, 23.9, 24.0, 149.6, 365.2, 1.0, 1),
      (4, "Mars", 0.642, 6792.0, 3933.0, 3.7, 5.0, 24.6, 24.7, 227.9, 687.0, 0.01, 2),
      (5, "Jupiter", 1898.0, 142984.0, 1326.0, 23.1, 59.5, 9.9, 9.9, 778.6, 4331.0, Double.NaN, 79),
      (6, "Saturn", 568.0, 120536.0, 687.0, 9.0, 35.5, 10.7, 10.7, 1433.5, 10747.0, Double.NaN, 62),
      (7, "Uranus", 86.8, 51118.0, 1271.0, 8.7, 21.3, -17.2, 17.2, 2872.5, 30589.0, Double.NaN, 27),
      (8, "Neptune", 102.0, 49528.0, 1638.0, 11.0, 23.5, 16.1, 16.1, 4495.1, 59800.0, Double.NaN, 14),
      (9, "Pluto", 0.0146, 2370.0, 2095.0, 0.7, 1.3, -153.3, 153.3, 5906.4, 90560.0, 0.00001, 5))
      .toDF("id", "name", "mass", "diameter", "density", "gravity",
        "escape_velocity", "rotation_period", "length_of_day",
        "distance_from_sun", "orbital_period", "surface_pressure", "number_of_moons")
      .createOrReplaceTempView(s"${prefix}planets")

    // Deterministic synthetic satellites keyed to planets (schema parity).
    spark.range(1, 178).selectExpr(
      "id",
      "CAST(1 + id % 9 AS INT) AS planet_id",
      "concat('sat_', id) AS name",
      "round(1000.0 + (id * 37 % 500000) / 7.0, 2) AS gm",
      "round(10.0 + (id * 91 % 2500) / 10.0, 1) AS radius",
      "round(0.05 + (id * 13 % 90) / 100.0, 2) AS magnitude")
      .createOrReplaceTempView(s"${prefix}satellites")

    spark.range(1, 358).selectExpr(
      "id",
      "concat('astronaut_', id) AS name",
      "CAST(1930 + id % 60 AS INT) AS birth_year",
      "CASE WHEN id % 3 = 0 THEN 'Military' ELSE 'Civilian' END AS group_type",
      "CAST(id % 7 AS INT) AS space_flights",
      "CAST((id * 97) % 4000 AS INT) AS space_flight_hours")
      .createOrReplaceTempView(s"${prefix}astronauts")

    spark.range(1, 4631).selectExpr(
      "concat('mission_', id) AS name",
      "CAST(1957 + id % 65 AS INT) AS year",
      "CASE WHEN id % 5 = 0 THEN 'Failure' ELSE 'Success' END AS status")
      .createOrReplaceTempView(s"${prefix}missions")

    // $no_table: the implicit one-row relation behind table-less SELECTs.
    Seq(Tuple1(1)).toDF("id").createOrReplaceTempView(s"${prefix}no_table")

    // $user: current session principal.
    Seq((spark.sparkContext.sparkUser, "current"))
      .toDF("user_name", "attribute").createOrReplaceTempView(s"${prefix}user")

    // Standard English stop words (public list).
    val stopWords = Seq("a", "about", "above", "after", "again", "against",
      "all", "am", "an", "and", "any", "are", "as", "at", "be", "because",
      "been", "before", "being", "below", "between", "both", "but", "by",
      "could", "did", "do", "does", "doing", "down", "during", "each", "few",
      "for", "from", "further", "had", "has", "have", "having", "he", "her",
      "here", "hers", "him", "his", "how", "i", "if", "in", "into", "is",
      "it", "its", "just", "me", "more", "most", "my", "no", "nor", "not",
      "now", "of", "off", "on", "once", "only", "or", "other", "our", "out",
      "over", "own", "same", "she", "should", "so", "some", "such", "than",
      "that", "the", "their", "them", "then", "there", "these", "they",
      "this", "those", "through", "to", "too", "under", "until", "up",
      "very", "was", "we", "were", "what", "when", "where", "which", "while",
      "who", "whom", "why", "with", "you", "your")
    stopWords.toDF("value").createOrReplaceTempView(s"${prefix}stop_words")
  }

  /** $variables / $statistics are session-dependent — materialized on demand. */
  def variables(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.conf.getAll.toSeq.sortBy(_._1).toDF("name", "value")
  }

  /** information_schema.tables / .columns — materialized from the Spark
    * catalog on demand (reference: opteryx routes `information_schema` as a
    * connector prefix, connectors/__init__.py:97). Covers temp views and
    * catalog tables visible to the session. */
  def infoSchemaTables(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listTables().collect().toSeq
      .map(t => (Option(t.catalog).getOrElse(""), Option(t.database).getOrElse(""),
        t.name, t.tableType, t.isTemporary))
      .sortBy(_._3)
      .toDF("table_catalog", "table_schema", "table_name", "table_type", "is_temporary")
  }

  def infoSchemaColumns(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listTables().collect().toSeq.flatMap { t =>
      scala.util.Try(spark.table(t.name).schema.fields.zipWithIndex.map {
        case (f, i) => (t.name, f.name, i + 1, f.dataType.simpleString, f.nullable)
      }.toSeq).getOrElse(Nil)
    }.sortBy(r => (r._1, r._3))
      .toDF("table_name", "column_name", "ordinal_position", "data_type", "is_nullable")
  }

  /** $statistics — engine runtime counters as key/value rows (reference:
    * opteryx/virtual_datasets/statistics.py publishes bufferpool/system
    * counters; the Spark-native equivalents are scheduler, executor and
    * session counters — Spark's buffer pool is Tungsten's, not ours to
    * meter). */
  def statistics(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val sc = spark.sparkContext
    val tracker = sc.statusTracker
    Seq(
      "uptime_seconds" -> ((System.currentTimeMillis() - sc.startTime) / 1000.0).toString,
      "spark_version" -> sc.version,
      "application_id" -> sc.applicationId,
      "default_parallelism" -> sc.defaultParallelism.toString,
      "executor_count" -> tracker.getExecutorInfos.length.toString,
      "active_jobs" -> tracker.getActiveJobIds().length.toString,
      "active_stages" -> tracker.getActiveStageIds().length.toString,
      "completed_jobs" -> tracker.getJobIdsForGroup(null).length.toString,
      "shuffle_partitions" -> spark.conf.get("spark.sql.shuffle.partitions"),
      "aqe_enabled" -> spark.conf.get("spark.sql.adaptive.enabled"))
      .toDF("key", "value")
  }
}
