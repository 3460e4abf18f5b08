package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg table surface (reference: opteryx/connectors/iceberg_connector.py:
  * 122-330 — catalog-loaded tables, snapshot selection for point-in-time
  * reads :176-210, predicate pushdown :57-120).
  *
  * No Iceberg runtime jar ships in this environment (zero egress), so this
  * module is the API + planning layer: catalog wiring, snapshot selection,
  * time-travel option mapping, and graft temporal-`FOR` → Spark time-travel
  * translation are real and spec-covered (IcebergSpec). An actual table read
  * additionally needs `org.apache.iceberg.spark.SparkCatalog` on the
  * classpath — checked at registration with a documented error, the same
  * env-limitation treatment as Mongo/Cassandra (COVERAGE.md §sources).
  *
  * On a real cluster nothing else changes: Spark's DSv2 handles predicate
  * and projection pushdown into Iceberg scans natively (the hand-built
  * predicate→Iceberg-expression mapping of the reference's :57-120 is
  * exactly what Catalyst + the Iceberg Spark runtime already do), and the
  * time-travel options below are the stock Spark 3.3+ surface.
  */
object Iceberg {

  val CatalogImpl = "org.apache.iceberg.spark.SparkCatalog"

  def runtimeAvailable: Boolean =
    try { Class.forName(CatalogImpl); true }
    catch { case _: ClassNotFoundException => false }

  /** One snapshot row of the table's history (the reference reads the same
    * pair from `table.inspect.snapshots()`). `committedAtMillis` is the
    * commit wall-clock in epoch millis. */
  final case class Snapshot(snapshotId: Long, committedAtMillis: Long)

  /** A resolved time-travel target: exactly one of snapshot id ("VERSION AS
    * OF") or timestamp ("TIMESTAMP AS OF"). */
  final case class TimeTravel(versionAsOf: Option[Long], timestampAsOf: Option[String]) {
    require(versionAsOf.isDefined != timestampAsOf.isDefined,
      "exactly one of versionAsOf/timestampAsOf")
  }
  object TimeTravel {
    def version(id: Long): TimeTravel = TimeTravel(Some(id), None)
    def asOf(ts: String): TimeTravel = TimeTravel(None, Some(ts))
  }

  /** The spark.sql.catalog.* keys that register an Iceberg catalog. */
  def catalogConf(name: String, catalogType: String,
      warehouse: String): Map[String, String] = Map(
    s"spark.sql.catalog.$name" -> CatalogImpl,
    s"spark.sql.catalog.$name.type" -> catalogType,
    s"spark.sql.catalog.$name.warehouse" -> warehouse)

  /** Register an Iceberg catalog on the session. Fails loudly (not lazily at
    * first read) when the runtime jar is absent. */
  def registerCatalog(spark: SparkSession, name: String,
      catalogType: String = "hadoop", warehouse: String): Unit = {
    if (!runtimeAvailable)
      throw new IllegalStateException(
        s"Iceberg runtime not on the classpath ($CatalogImpl): add the " +
          "iceberg-spark-runtime jar matching this Spark version. " +
          "The graft Iceberg surface (snapshot selection, temporal FOR " +
          "mapping, catalog wiring) is environment-independent; only the " +
          "physical read needs the jar.")
    catalogConf(name, catalogType, warehouse).foreach { case (k, v) =>
      spark.conf.set(k, v)
    }
  }

  /** DataFrameReader options for a time-travel read — Spark's stock DSv2
    * surface (`versionAsOf` / `timestampAsOf`). */
  def readOptions(tt: TimeTravel): Map[String, String] =
    tt.versionAsOf.map(v => Map("versionAsOf" -> v.toString))
      .getOrElse(Map("timestampAsOf" -> tt.timestampAsOf.get))

  /** The SQL spelling of the same time travel. */
  def timeTravelClause(tt: TimeTravel): String =
    tt.versionAsOf.map(v => s"VERSION AS OF $v")
      .getOrElse(s"TIMESTAMP AS OF '${tt.timestampAsOf.get}'")

  /** Snapshot selection for a point-in-time read, mirroring the reference's
    * rules (iceberg_connector.py:176-210): the latest snapshot committed at
    * or before the target; a target BEFORE the first snapshot is an error
    * (no data existed then); a target AFTER the latest selects the latest.
    * Pure logic so it is testable without a runtime jar. */
  def snapshotFor(history: Seq[Snapshot], targetMillis: Long): Snapshot = {
    require(history.nonEmpty, "table has no snapshots")
    val sorted = history.sortBy(_.committedAtMillis)
    if (targetMillis < sorted.head.committedAtMillis)
      throw new NoSuchElementException("No data available for the specified date.")
    sorted.takeWhile(_.committedAtMillis <= targetMillis).lastOption
      .getOrElse(sorted.last)
  }

  /** graft temporal `FOR <spec>` → Iceberg time travel. Point-in-time specs
    * map to TIMESTAMP AS OF; ranged specs (DATES BETWEEN/SINCE/IN, LAST n
    * DAYS) are not snapshot-expressible and are rejected, matching the
    * reference's point-in-time-only contract for Iceberg tables
    * (iceberg_connector.py:169-174). */
  def temporalForToTimeTravel(spec: String): TimeTravel = {
    val s = spec.trim
    val u = s.toUpperCase
    if (u.startsWith("DATES") || u.matches("""LAST\s+\d+\s+DAYS"""))
      throw new UnsupportedOperationException(
        s"Iceberg tables support point-in-time FOR reads only (a snapshot " +
          s"as of one timestamp); ranged spec `$s` has no snapshot equivalent")
    u match {
      case "TODAY" => TimeTravel.asOf(java.time.LocalDate.now().toString)
      case "YESTERDAY" =>
        TimeTravel.asOf(java.time.LocalDate.now().minusDays(1).toString)
      case _ if s.startsWith("'") && s.endsWith("'") =>
        TimeTravel.asOf(s.substring(1, s.length - 1))
      case _ =>
        throw new IllegalArgumentException(s"Unrecognized temporal spec `$s`")
    }
  }

  /** Read `catalog.db.table` at an optional time-travel point. Needs the
    * runtime jar; everything up to the physical read is the mapping above. */
  def scan(spark: SparkSession, table: String,
      tt: Option[TimeTravel] = None): DataFrame = {
    if (!runtimeAvailable)
      throw new IllegalStateException(
        s"Iceberg runtime not on the classpath ($CatalogImpl)")
    val reader = spark.read
    tt.map(t => readOptions(t).foldLeft(reader) { case (r, (k, v)) => r.option(k, v) })
      .getOrElse(reader)
      .table(table)
  }
}
