package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** The user-facing engine facade — the Spark-native equivalent of the
  * reference's `opteryx.query()` / DB-API surface
  * (reference: opteryx/__init__.py:151-264, opteryx/cursor.py:39).
  *
  * {{{
  * val g = Graft(spark)                         // or Graft.embedded()
  * g.registerDir("/data/sf0.01")                // testdata-layout tables
  * g.query("SELECT event_type, props ->> 'k' FROM events LIMIT 5")
  * g.query("SELECT * FROM 'path/to/file.parquet'")
  * g.query("SELECT DISTINCT ON (c_nationkey) c_nationkey, c_name FROM customer ORDER BY c_nationkey, c_acctbal DESC")
  * g.query("SELECT count(*) FROM events FOR DATES BETWEEN '2024-01-01' AND '2024-02-01'")
  * }}}
  */
class Graft(val spark: SparkSession) {

  GraftSession.prepare(spark)

  /** table → event-time column for temporal `FOR` resolution. Mirrors the
    * reference's Diachronic connector capability
    * (reference: opteryx/connectors/capabilities/). */
  private val temporalColumns =
    scala.collection.mutable.Map[String, String]("events" -> "ts")

  def registerTemporalColumn(table: String, column: String): Unit =
    temporalColumns(table.toLowerCase) = column

  /** Register every table of a testdata-layout directory as a temp view. */
  def registerDir(dir: String): Unit = Tables.registerAll(spark, dir)

  /** Register an arbitrary DataFrame (the reference's `register_df`,
    * opteryx/__init__.py:95-97). */
  def registerDf(name: String, df: DataFrame): Unit =
    df.createOrReplaceTempView(name)

  /** Run a statement in the graft dialect (ANSI Spark SQL + the reference's
    * extensions). Positional `?` parameters are bound injection-safe via
    * Spark's parameterized-SQL API. */
  /** JSON-defined views + prepared statements (reference:
    * opteryx/planner/views, EXECUTE at logical_planner.py:757-827). */
  val views = new graft.sources.Views(spark)
  private val prepared = scala.collection.mutable.Map.empty[String, String]

  def defineView(name: String, sql: String): Unit = {
    views.define(name, sql)
    query(sql).createOrReplaceTempView(name)
  }
  def loadViews(path: String): Unit = {
    views.loadJson(path)
    views.materializeAll(s => GraftSql.rewrite(s).sql)
  }
  def prepare(name: String, sql: String): Unit = prepared(name) = sql

  private val executeRe = """(?is)^\s*EXECUTE\s+(\w+)\s*(?:\((.*)\))?\s*;?\s*$""".r

  def query(sql: String, args: Any*): DataFrame = {
    // EXECUTE <prepared> (p1, p2, ...) — positional binds, injection-safe
    sql match {
      case executeRe(name, params) if prepared.contains(name) =>
        val bound: Seq[Any] = Option(params).filter(_.trim.nonEmpty).toSeq
          .flatMap(_.split(",").toSeq.map(_.trim).map {
            case s if s.startsWith("'") && s.endsWith("'") => s.substring(1, s.length - 1)
            case n if n.matches("""-?\d+""") => n.toLong
            case d if d.matches("""-?\d*\.\d+""") => d.toDouble
            case other => other
          })
        return query(prepared(name), bound: _*)
      case _ => ()
    }
    // meta-statement surface (SHOW COLUMNS / SET @var / SHOW var / EXPLAIN)
    sql match {
      case Meta.ShowColumnsRe(ext, table) =>
        return Meta.showColumns(spark, table, ext != null)
      case Meta.SetVarRe(name, value) =>
        return Meta.setVariable(spark, name, GraftSql.rewrite(value).sql)
      case Meta.ExplainRe(analyze, inner) =>
        return Meta.explain(spark, query(inner, args: _*), analyze != null)
      case Meta.ShowVarRe(name)
          if !Set("tables", "databases", "views", "functions", "columns")
            .contains(name.toLowerCase) =>
        return Meta.showValue(spark, name)
      case _ => ()
    }
    val rw = GraftSql.rewrite(sql)
    // $variables is session-state-dependent — refresh it per statement
    if (rw.sql.contains(graft.sources.VirtualDatasets.prefix + "variables"))
      graft.sources.VirtualDatasets.variables(spark)
        .createOrReplaceTempView(graft.sources.VirtualDatasets.prefix + "variables")
    // zero-config path tables → temp views (Catalyst prunes/pushes down into
    // the scan exactly as for a catalog table)
    rw.pathTables.foreach { p =>
      graft.sources.Formats.read(spark, p)
        .createOrReplaceTempView(GraftSql.viewNameFor(p))
    }
    // temporal FOR ranges → event-time-filtered views over the base
    // relation, so the predicate sits at the scan (partition/row-group
    // pruning applies) rather than over the query result
    rw.temporal.foreach { t =>
      val base = spark.table(t.relation)
      val filtered = temporalColumns.get(t.relation.toLowerCase) match {
        case Some(c) =>
          base.filter(col(c) >= expr(s"cast(${t.start} as timestamp_ntz)")
            && col(c) < expr(s"cast(${t.end} as timestamp_ntz) + interval 1 day"))
        case None => base // non-temporal relation: FOR reads current state
      }
      filtered.createOrReplaceTempView(t.viewName)
    }
    if (args.nonEmpty) spark.sql(rw.sql, args.toArray)
    else spark.sql(rw.sql)
  }

  /** Stream results incrementally — the reference's
    * `query_to_arrow_batches` surface (opteryx/__init__.py:228-264): rows
    * arrive partition by partition without materializing the full result on
    * the driver. */
  def stream(sql: String, args: Any*): Iterator[org.apache.spark.sql.Row] = {
    import scala.jdk.CollectionConverters._
    query(sql, args: _*).toLocalIterator().asScala
  }

  def explain(sql: String): String = {
    val rw = GraftSql.rewrite(sql)
    spark.sql(rw.sql).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }
}

object Graft {
  def apply(spark: SparkSession): Graft = new Graft(spark)

  /** Zero-config embedded session, like `import opteryx; opteryx.query(...)`. */
  def embedded(): Graft = new Graft(GraftSession.create())
}
