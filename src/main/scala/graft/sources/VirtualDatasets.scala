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
  * are deterministic synthetic stand-ins with EXACT reference schema parity
  * (column names incl. the camelCase primaries and misspelled legacy
  * aliases, struct/array/date columns, nullability) — the capability under
  * test is virtual-relation routing and dialect resolution, not astronomy.
  */
object VirtualDatasets {

  val prefix = "graft_virtual_"

  /** Column-name aliases the reference resolves per relation (reference:
    * opteryx/virtual_datasets/planet_data.py:100-113 `aliases=[...]`,
    * satellite_data.py:50, missions.py:47 — including the reference's own
    * misspelled alias rows, which its users' queries depend on). GraftSql
    * rewrites an alias to its primary name when the statement references the
    * owning `$relation`. */
  val columnAliases: Map[String, Seq[(String, String)]] = Map(
    "planets" -> Seq(
      "escape_velocity" -> "escapeVelocity", "rotation_period" -> "rotationPeriod",
      "length_of_day" -> "lengthOfDay", "distance_from_sun" -> "distanceFromSun",
      "orbital_period" -> "orbitalPeriod", "orbital_velocity" -> "orbitalVelocity",
      "oribtal_velocity" -> "orbitalVelocity", "orbital_inclination" -> "orbitalInclination",
      "oribtial_inclination" -> "orbitalInclination",
      "orbital_eccentricity" -> "orbitalEccentricity",
      "obliquity_to_orbit" -> "obliquityToOrbit", "mean_temperature" -> "meanTemperature",
      "surface_pressure" -> "surfacePressure", "number_of_moons" -> "numberOfMoons"),
    "satellites" -> Seq("planet_id" -> "planetId"),
    "missions" -> Seq("Launched_at" -> "Lauched_at"))

  def register(spark: SparkSession): Unit = {
    import spark.implicits._

    // Planetary fact-sheet data (public: NASA planetary fact sheet; schema
    // parity with reference planet_data.py:93-114 — camelCase primaries,
    // DECIMAL(3,1) gravity, NULL surfacePressure for the gas giants).
    Seq(
      (1, "Mercury", 0.33, 4879L, 5427L, "3.7", 4.3, 1407.6, 4222.6, 57.9, 46.0, 69.8, 88.0, 47.4, 7.0, 0.205, 0.03, 167L, Some(0.0), 0L),
      (2, "Venus", 4.87, 12104L, 5243L, "8.9", 10.4, -5832.5, 2802.0, 108.2, 107.5, 108.9, 224.7, 35.0, 3.4, 0.007, 177.4, 464L, Some(92.0), 0L),
      (3, "Earth", 5.97, 12756L, 5514L, "9.8", 11.2, 23.9, 24.0, 149.6, 147.1, 152.1, 365.2, 29.8, 0.0, 0.017, 23.4, 15L, Some(1.0), 1L),
      (4, "Mars", 0.642, 6792L, 3933L, "3.7", 5.0, 24.6, 24.7, 227.9, 206.6, 249.2, 687.0, 24.1, 1.9, 0.094, 25.2, -63L, Some(0.001), 2L),
      (5, "Jupiter", 1898.0, 142984L, 1326L, "23.1", 59.5, 9.9, 9.9, 778.6, 740.5, 816.6, 4331.0, 13.1, 1.3, 0.049, 3.1, -108L, None, 79L),
      (6, "Saturn", 568.0, 120536L, 687L, "9", 35.5, 10.7, 10.7, 1433.5, 1352.6, 1514.5, 10747.0, 9.7, 2.5, 0.057, 26.7, -139L, None, 82L),
      (7, "Uranus", 86.8, 51118L, 1271L, "8.7", 21.3, -17.2, 17.2, 2872.5, 2741.3, 3003.6, 30589.0, 6.8, 0.8, 0.046, 97.8, -197L, None, 27L),
      (8, "Neptune", 102.0, 49528L, 1638L, "11", 23.5, 16.1, 16.1, 4495.1, 4444.5, 4545.7, 59800.0, 5.4, 1.8, 0.011, 28.3, -201L, None, 14L),
      (9, "Pluto", 0.0146, 2370L, 2095L, "0.7", 1.3, -153.3, 153.3, 5906.4, 4436.8, 7375.9, 90560.0, 4.7, 17.2, 0.244, 122.5, -225L, Some(0.00001), 5L))
      .toDF("id", "name", "mass", "diameter", "density", "gravity_s",
        "escapeVelocity", "rotationPeriod", "lengthOfDay", "distanceFromSun",
        "perihelion", "aphelion", "orbitalPeriod", "orbitalVelocity",
        "orbitalInclination", "orbitalEccentricity", "obliquityToOrbit",
        "meanTemperature", "surfacePressure", "numberOfMoons")
      .selectExpr("id", "name", "mass", "diameter", "density",
        "CAST(gravity_s AS DECIMAL(3,1)) AS gravity", "escapeVelocity",
        "rotationPeriod", "lengthOfDay", "distanceFromSun", "perihelion",
        "aphelion", "orbitalPeriod", "orbitalVelocity", "orbitalInclination",
        "orbitalEccentricity", "obliquityToOrbit", "meanTemperature",
        "surfacePressure", "numberOfMoons")
      .createOrReplaceTempView(s"${prefix}planets")

    // The real 177-moon satellite table (public-domain NASA data via the
    // devstronomy scraper — reference satellite_data.py:15-19 cites the
    // same source), embedded as a classpath resource so joins and the
    // golden-results tier match the reference's exact values. Schema parity
    // with satellite_data.py:44-58: camelCase planetId, DOUBLE metrics.
    val satRows = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/graft/satellites.csv"), "UTF-8")
      .getLines().drop(1).map { ln =>
        val p = ln.split(",", -1)
        def d(s: String): Option[Double] = if (s.isEmpty) None else Some(s.toDouble)
        (p(0).toInt, p(1).toInt, p(2), p(3).toDouble, p(4).toDouble,
          d(p(5)), d(p(6)), d(p(7)))
      }.toSeq
    satRows
      .toDF("id", "planetId", "name", "gm", "radius", "density", "magnitude", "albedo")
      .createOrReplaceTempView(s"${prefix}satellites")

    // The real 357-astronaut table (public NASA astronaut fact data — the
    // reference embeds the same dataset, astronaut_data.py), as a JSONL
    // resource parsed against the reference's exact schema
    // (astronaut_data.py:51-69: INTEGER year/group/counters, DATE
    // birth/death, STRUCT birth_place, VARCHAR arrays).
    val astroSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "name STRING, year INT, `group` INT, status STRING, birth_date DATE, " +
        "birth_place STRUCT<state: STRING, town: STRING>, gender STRING, " +
        "alma_mater ARRAY<STRING>, undergraduate_major STRING, " +
        "graduate_major STRING, military_rank STRING, military_branch STRING, " +
        "space_flights INT, space_flight_hours INT, space_walks INT, " +
        "space_walks_hours INT, missions ARRAY<STRING>, death_date DATE, " +
        "death_mission STRING")
    val astroLines = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/graft/astronauts.jsonl"), "UTF-8")
      .getLines().toSeq
    spark.read.schema(astroSchema).json(astroLines.toDS())
      .createOrReplaceTempView(s"${prefix}astronauts")

    // The real 4,630-launch table (public launch-log data — the reference
    // embeds the same dataset, missions.py; note its misspelled
    // `Lauched_at` primary with `Launched_at` as the alias).
    val missionSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "Company STRING, Location STRING, Price DOUBLE, Lauched_at TIMESTAMP, " +
        "Rocket STRING, Rocket_Status STRING, Mission STRING, Mission_Status STRING")
    val missionLines = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/graft/missions.jsonl"), "UTF-8")
      .getLines().toSeq
    spark.read.schema(missionSchema).json(missionLines.toDS())
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

  /** `$planets FOR <date>` pseudo-temporality (reference
    * planet_data.py:77-88): the fact sheet "as of" a date excludes planets
    * not yet discovered — Uranus 1781-04-26, Neptune 1846-11-13, Pluto
    * 1930-03-13. Returned as a SQL predicate over `id` so the filter stays
    * in the plan (no driver-side date evaluation). */
  def planetsAsOfPredicate(endDateExpr: String): String =
    s"""(id <= 6
       | OR (id = 7 AND CAST($endDateExpr AS DATE) >= DATE'1781-04-26')
       | OR (id = 8 AND CAST($endDateExpr AS DATE) >= DATE'1846-11-13')
       | OR (id = 9 AND CAST($endDateExpr AS DATE) >= DATE'1930-03-13'))""".stripMargin

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
