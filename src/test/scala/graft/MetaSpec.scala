package graft

import org.scalatest.funsuite.AnyFunSuite

/** Meta/ops statement surface (SURVEY.md §7 M5). */
class MetaSpec extends AnyFunSuite {
  private val spark = SharedSpark.spark
  private lazy val g = {
    val g = Graft(spark)
    g.registerDir(SharedSpark.sf)
    g
  }

  test("SHOW COLUMNS lists schema") {
    val rows = g.query("SHOW COLUMNS FROM nation").collect()
    assert(rows.map(_.getString(0)).toSet ==
      Set("n_nationkey", "n_name", "n_regionkey"))
  }

  test("SHOW EXTENDED COLUMNS computes stats in one pass") {
    val rows = g.query("SHOW EXTENDED COLUMNS FROM region").collect()
    val byName = rows.map(r => r.getString(0) -> r).toMap
    assert(byName("r_regionkey").getAs[Long]("count") == 5L)
    assert(byName("r_regionkey").getAs[Long]("nulls") == 0L)
    assert(byName("r_regionkey").getAs[String]("min") == "0")
  }

  test("SET @var then reference via @var and SHOW") {
    g.query("SET @threshold = 3")
    val n = g.query("SELECT count(*) AS n FROM nation WHERE n_regionkey < @threshold").head().getLong(0)
    val direct = g.query("SELECT count(*) AS n FROM nation WHERE n_regionkey < 3").head().getLong(0)
    assert(n == direct && n > 0)
    assert(g.query("SHOW threshold").head().getString(1) == "3")
  }

  test("SHOW CREATE VIEW returns the defining SQL") {
    g.defineView("top_nations", "SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 0")
    val r = g.query("SHOW CREATE VIEW top_nations").head()
    assert(r.getString(0) == "top_nations")
    assert(r.getString(1).contains("CREATE VIEW top_nations AS SELECT n_nationkey"))
  }

  test("SHOW of a spark conf key") {
    val v = g.query("SHOW spark.sql.shuffle.partitions").head().getString(1)
    assert(v.toInt > 0)
  }

  test("EXPLAIN returns a formatted plan") {
    val plan = g.query("EXPLAIN SELECT count(*) FROM nation").collect().map(_.getString(0)).mkString("\n")
    assert(plan.contains("HashAggregate") || plan.contains("Aggregate"))
  }

  test("EXPLAIN ANALYZE executes and reports runtime metrics") {
    val plan = g.query("EXPLAIN ANALYZE SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey")
      .collect().map(_.getString(0)).mkString("\n")
    assert(plan.contains("=") && plan.nonEmpty)
  }

  test("EXPLAIN ANALYZE FORMAT MERMAID renders the executed join plan as a flowchart") {
    val lines = g.query("""EXPLAIN ANALYZE FORMAT MERMAID
      SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey""")
      .collect().map(_.getString(0))
    val text = lines.mkString("\n")
    assert(lines.head == "flowchart BT")
    assert(text.contains("NODE_0["), s"expected node declarations:\n$text")
    assert(text.contains("--> NODE_"), s"expected edges:\n$text")
    assert(text.contains("Join"), s"expected a join operator node:\n$text")
    assert(text.contains("rows\" -->"), s"ANALYZE must label edges with row counts:\n$text")
  }

  test("EXPLAIN FORMAT MERMAID (no analyze) renders unlabelled edges") {
    val text = g.query("EXPLAIN FORMAT MERMAID SELECT count(*) AS n FROM nation")
      .collect().map(_.getString(0)).mkString("\n")
    assert(text.startsWith("flowchart BT"))
    assert(text.contains("-->") && !text.contains("rows\" -->"))
  }

  test("@var inside string literal is untouched") {
    val s = g.query("SELECT 'mail@example' AS e").head().getString(0)
    assert(s == "mail@example")
  }
}
