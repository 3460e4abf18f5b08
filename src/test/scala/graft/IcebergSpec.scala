package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Iceberg
import graft.sources.Iceberg.{Snapshot, TimeTravel}

/** Iceberg planning surface (no runtime jar in this environment — the spec
  * covers everything up to the physical read: snapshot selection, temporal
  * FOR mapping, time-travel options, catalog wiring, and the documented
  * failure when the jar is absent).
  */
class IcebergSpec extends AnyFunSuite {

  private val history = Seq(
    Snapshot(101L, 1000L), Snapshot(102L, 2000L), Snapshot(103L, 3000L))

  test("snapshotFor picks the latest snapshot committed at or before the target") {
    assert(Iceberg.snapshotFor(history, 2500L).snapshotId == 102L)
    assert(Iceberg.snapshotFor(history, 2000L).snapshotId == 102L)
    assert(Iceberg.snapshotFor(history, 1000L).snapshotId == 101L)
  }

  test("snapshotFor: target after the latest snapshot selects the latest") {
    assert(Iceberg.snapshotFor(history, 99999L).snapshotId == 103L)
  }

  test("snapshotFor: target before the first snapshot is an error — no data existed") {
    intercept[NoSuchElementException](Iceberg.snapshotFor(history, 500L))
    intercept[IllegalArgumentException](Iceberg.snapshotFor(Nil, 500L))
  }

  test("temporal FOR point-in-time specs map to TIMESTAMP AS OF") {
    assert(Iceberg.temporalForToTimeTravel("'2024-03-01 12:00:00'")
      == TimeTravel.asOf("2024-03-01 12:00:00"))
    val today = java.time.LocalDate.now().toString
    assert(Iceberg.temporalForToTimeTravel("TODAY") == TimeTravel.asOf(today))
    assert(Iceberg.temporalForToTimeTravel("yesterday")
      == TimeTravel.asOf(java.time.LocalDate.now().minusDays(1).toString))
  }

  test("temporal FOR ranged specs are rejected — not snapshot-expressible") {
    for (spec <- Seq("DATES BETWEEN '2024-01-01' AND '2024-02-01'",
        "DATES SINCE '2024-01-01'", "DATES IN THIS_MONTH", "LAST 7 DAYS"))
      intercept[UnsupportedOperationException](Iceberg.temporalForToTimeTravel(spec))
  }

  test("time-travel renders to reader options and SQL clause") {
    assert(Iceberg.readOptions(TimeTravel.version(42L)) == Map("versionAsOf" -> "42"))
    assert(Iceberg.readOptions(TimeTravel.asOf("2024-03-01"))
      == Map("timestampAsOf" -> "2024-03-01"))
    assert(Iceberg.timeTravelClause(TimeTravel.version(42L)) == "VERSION AS OF 42")
    assert(Iceberg.timeTravelClause(TimeTravel.asOf("2024-03-01"))
      == "TIMESTAMP AS OF '2024-03-01'")
  }

  test("catalogConf wires the spark.sql.catalog.* keys") {
    val conf = Iceberg.catalogConf("lake", "hadoop", "/tmp/wh")
    assert(conf("spark.sql.catalog.lake") == Iceberg.CatalogImpl)
    assert(conf("spark.sql.catalog.lake.type") == "hadoop")
    assert(conf("spark.sql.catalog.lake.warehouse") == "/tmp/wh")
  }

  test("registration without the runtime jar fails loudly with the documented error") {
    assume(!Iceberg.runtimeAvailable)
    val g = Graft(SharedSpark.spark)
    val ex = intercept[IllegalStateException](
      g.registerIcebergCatalog("lake", "/tmp/wh"))
    assert(ex.getMessage.contains("classpath"))
    val ex2 = intercept[IllegalStateException](
      g.registerIceberg("t", "lake.db.t", snapshotId = Some(42L)))
    assert(ex2.getMessage.contains("Iceberg runtime"))
  }
}
