package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.DriverManager

/** JDBC federation (SURVEY.md §2.5, reference SqlConnector at
  * opteryx/connectors/sql_connector.py:64-240) against an embedded Derby
  * database (the JDBC driver bundled with Spark). Asserts both results and
  * the pushdown plan properties the reference implements as `pushed_sql`.
  */
class JdbcSpec extends AnyFunSuite {
  private val spark = SharedSpark.spark
  private lazy val g = {
    val g = Graft(spark)
    g.registerDir(SharedSpark.sf)
    g
  }

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.executeUpdate(
      "CREATE TABLE dim_status (code VARCHAR(4) NOT NULL, label VARCHAR(32), rank INT)")
    Seq(("'O'", "'open'", 1), ("'F'", "'filled'", 2), ("'P'", "'pending'", 3))
      .foreach { case (c, l, r) =>
        st.executeUpdate(s"INSERT INTO dim_status VALUES ($c, $l, $r)")
      }
    st.close(); conn.close()
  }

  test("registerJdbc: remote table joins against local parquet") {
    seeded
    g.registerJdbc("dim_status", url, "dim_status")
    val r = g.query("""
      SELECT label, count(*) AS n
      FROM orders JOIN dim_status ON o_orderstatus = code
      GROUP BY label ORDER BY label""").collect()
    assert(r.nonEmpty)
    assert(r.map(_.getString(0)).toSet.subsetOf(Set("open", "filled", "pending")))
  }

  test("predicates push into the remote engine (PushedFilters in the scan)") {
    seeded
    g.registerJdbc("dim_status", url, "dim_status")
    val df = g.query("SELECT label FROM dim_status WHERE rank > 1")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("RANK"),
      s"expected rank filter pushed to JDBC scan, plan:\n$plan")
    assert(df.collect().map(_.getString(0)).toSet == Set("filled", "pending"))
  }

  test("registerJdbcQuery: whole statement runs remotely") {
    seeded
    g.registerJdbcQuery("status_top", url,
      "SELECT code, rank FROM dim_status WHERE rank <= 2")
    val r = g.query("SELECT code FROM status_top ORDER BY rank").collect()
    assert(r.map(_.getString(0)).toSeq == Seq("O", "F"))
  }
}
