package graft

import org.apache.spark.sql.SparkSession

/** The reference engine's literal run-only SQL corpora (reference:
  * tests/integration/sql_battery/test_data/tests/&#42;.run_tests — ~1,150
  * user statements accumulated from its bug reports, docs and feature work;
  * loader semantics at test_run_only_battery.py:35-43: one statement per
  * line, `#`/`--` lines are comments, success = executes without error).
  *
  * The reference repo's local fixtures map to this repo's equivalents —
  * the capability under test is the DIALECT, not the fixture layout:
  *   - testdata.tpch_tiny.<t>  → the sf0.001 TPC-H views (same schemas)
  *   - testdata.clickbench_tiny → a hits-schema view derived from events
  *   - testdata.astronauts      → $astronauts
  *   - testdata.hyphened-name   → $astronauts (the reference fixture dir
  *     holds astronauts.parquet; the hyphenated-identifier DIALECT path is
  *     engine-supported — GraftSql.hyphenPathTable — and spec-covered in
  *     GraftSqlSpec, so only the fixture is mapped here)
  * `testdata.partitioned.nulls` has no equivalent fixture here
  * (reference-repo-specific files).
  */
object ReferenceCorpus {

  final case class Stmt(file: String, line: Int, sql: String)

  val files: Seq[String] = Seq(
    "clickbench", "documentation", "feature_tests", "generated",
    "opteryx-dialect", "optimizer", "planner", "power_bi", "regression",
    "system", "tpch_data", "types", "v2_planner", "variations")

  def statements: Seq[Stmt] = files.flatMap { f =>
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream(s"/battery/reference/$f.run_tests"), "UTF-8")
    try src.getLines().zipWithIndex.collect {
      case (l, i) if l.trim.nonEmpty && !l.startsWith("#") && !l.startsWith("--") =>
        Stmt(f, i + 1, l.trim)
    }.toList
    finally src.close()
  }

  def mapFixtures(sql: String): String = sql
    .replaceAll("(?i)\\btestdata\\.tpch_tiny\\.", "")
    .replaceAll("(?i)\\btestdata\\.clickbench_tiny\\b", "clickbench_tiny")
    .replaceAll("(?i)\\btestdata\\.partitioned\\.nulls\\b", "partitioned_nulls")
    .replaceAll("(?i)\\btestdata\\.astronauts\\b",
      java.util.regex.Matcher.quoteReplacement("$astronauts"))
    .replaceAll("(?i)\\btestdata\\.hyphened-name\\b",
      java.util.regex.Matcher.quoteReplacement("$astronauts"))

  /** hits-schema view (public ClickBench schema: the column names/types the
    * corpus statements reference) derived deterministically from events. */
  private val clickbenchView = """
    SELECT CAST(event_id AS BIGINT) AS WatchID,
           concat('title_', event_id % 97) AS Title,
           CAST(ts AS DATE) AS EventDate,
           CAST(ts AS TIMESTAMP) AS EventTime,
           CAST(event_id % 63 AS INT) AS CounterID,
           CAST(pmod(hash(user_id), 1000000) AS INT) AS ClientIP,
           CAST(event_id % 229 AS INT) AS RegionID,
           CAST(user_id AS BIGINT) AS UserID,
           CASE WHEN event_id % 5 = 0 THEN '' ELSE concat('phrase ', event_id % 311) END AS SearchPhrase,
           CAST(event_id % 13 AS INT) AS SearchEngineID,
           CAST(CASE WHEN event_id % 7 = 0 THEN event_id % 11 ELSE 0 END AS INT) AS AdvEngineID,
           CAST(800 + event_id % 1120 AS INT) AS ResolutionWidth,
           CAST(1 + event_id % 9 AS INT) AS PageViews,
           CAST(CASE WHEN event_id % 17 = 0 THEN 1 ELSE 0 END AS INT) AS IsRefresh,
           CAST(CASE WHEN event_id % 23 = 0 THEN 1 ELSE 0 END AS INT) AS DontCountHits,
           concat('http://example.com/', event_id % 437) AS URL,
           CASE WHEN event_id % 3 = 0 THEN '' ELSE concat('http://ref.example.com/', event_id % 131) END AS Referer,
           hash(concat('u', event_id % 437)) AS URLHash,
           hash(concat('r', event_id % 131)) AS RefererHash,
           CAST(event_id % 9 - 1 AS INT) AS TraficSourceID,
           CAST(640 + event_id % 1280 AS INT) AS WindowClientWidth,
           CAST(480 + event_id % 960 AS INT) AS WindowClientHeight,
           CASE WHEN event_id % 4 = 0 THEN concat('model_', event_id % 29) ELSE '' END AS MobilePhoneModel,
           CAST(event_id % 6 AS INT) AS MobilePhone,
           CAST(CASE WHEN event_id % 19 = 0 THEN 1 ELSE 0 END AS INT) AS IsLink,
           CAST(CASE WHEN event_id % 41 = 0 THEN 1 ELSE 0 END AS INT) AS IsDownload
    FROM events"""

  /** A corpus engine on its OWN SparkSession (same SparkContext, fresh
    * conf/catalog) with `spark.sql.ansi.enabled=false`: the reference engine
    * has permissive arithmetic — `1/0` IS NULL and malformed casts return
    * NULL are load-bearing statements in its regression corpus — while the
    * gate sessions keep Spark 4's ANSI default. The driver's TPC-H-ish
    * testdata lacks five columns the corpus references
    * (l_shipmode/l_shipinstruct/p_container/c_comment/s_comment); the views
    * here extend the parquet with deterministic domain-correct values, so
    * those statements exercise the dialect instead of failing on fixtures. */
  def engine(spark: SparkSession, dir: String): Graft = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.ansi.enabled", "false")
    val g = Graft(s2)
    g.registerDir(dir)
    g.query("""
      SELECT *,
             elt(1 + CAST(l_orderkey * 7 + l_linenumber AS INT) % 7,
                 'AIR', 'AIR REG', 'MAIL', 'SHIP', 'TRUCK', 'RAIL', 'FOB') AS l_shipmode,
             elt(1 + CAST(l_orderkey + l_linenumber AS INT) % 4,
                 'DELIVER IN PERSON', 'COLLECT COD', 'NONE', 'TAKE BACK RETURN') AS l_shipinstruct
      FROM lineitem""").createOrReplaceTempView("lineitem")
    g.query("""
      SELECT *,
             concat(elt(1 + CAST(p_partkey AS INT) % 5, 'SM', 'MED', 'LG', 'JUMBO', 'WRAP'), ' ',
                    elt(1 + CAST(p_partkey AS INT) % 7, 'CASE', 'BOX', 'BAG', 'JAR', 'PKG', 'PACK', 'CAN')) AS p_container
      FROM part""").createOrReplaceTempView("part")
    g.query("""
      SELECT *, concat('customer comment ',
             CASE WHEN c_custkey % 11 = 0 THEN 'special requests pending' ELSE 'regular account' END) AS c_comment
      FROM customer""").createOrReplaceTempView("customer")
    g.query("""
      SELECT *, concat('supplier comment ',
             CASE WHEN s_suppkey % 13 = 0 THEN 'customer complaints logged' ELSE 'in good standing' END) AS s_comment
      FROM supplier""").createOrReplaceTempView("supplier")
    g.query(clickbenchView).createOrReplaceTempView("clickbench_tiny")
    // the reference's partitioned nulls fixture: nullable tweet text
    g.query("""
      SELECT CASE WHEN event_id % 3 = 0 THEN NULL
                  ELSE concat('tweet text ', event_id % 211) END AS tweet,
             CAST(ts AS DATE) AS dt
      FROM events""").createOrReplaceTempView("partitioned_nulls")
    g
  }
}
