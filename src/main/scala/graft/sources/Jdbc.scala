package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC federation (reference: opteryx/connectors/sql_connector.py:64-240).
  *
  * The reference's SqlConnector composes a pushed SQL fragment — projection,
  * DNF predicates, LIMIT — and ships it to the remote engine
  * (sql_connector.py:205-216 `pushed_sql`). Spark's JDBC source does the
  * same through Catalyst: `pushDownPredicate` compiles data filters into the
  * remote WHERE clause, `pushDownLimit` ships LIMIT, and column pruning
  * arrives as an explicit remote SELECT list. `.explain` on a registered
  * JDBC relation shows `PushedFilters: [...]` exactly like a parquet scan.
  *
  * Scale note: a single JDBC connection is one partition; for a large remote
  * table pass `partitionColumn`/`lowerBound`/`upperBound`/`numPartitions`
  * in `options` so Spark opens parallel range-bounded connections — the
  * 1000-executor equivalent of the reference's single-process fetch.
  */
object Jdbc {

  def table(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    reader(spark, url, options).option("dbtable", table).load()

  /** Whole-statement pushdown: the remote engine runs `sql` and Spark scans
    * its result (the reference's full-query fallback). */
  def query(spark: SparkSession, url: String, sql: String,
      options: Map[String, String] = Map.empty): DataFrame =
    reader(spark, url, options).option("query", sql).load()

  private def reader(spark: SparkSession, url: String,
      options: Map[String, String]) = {
    var r = spark.read.format("jdbc")
      .option("url", url)
      .option("pushDownPredicate", "true")
      .option("pushDownLimit", "true")
      .option("pushDownAggregate", "true")
      .option("pushDownOffset", "true")
    options.foreach { case (k, v) => r = r.option(k, v) }
    r
  }
}
