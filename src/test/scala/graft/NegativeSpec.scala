package graft

import org.scalatest.funsuite.AnyFunSuite

/** Error-path battery (the reference's invalid-statement tier,
  * tests/integration/sql_battery error corpora): statements that MUST fail,
  * and fail at plan/parse time with a real exception — not silently return
  * wrong results. Each case documents the failure class it guards.
  */
class NegativeSpec extends AnyFunSuite {
  private val spark = SharedSpark.spark
  private lazy val g = {
    val eng = Graft(spark)
    eng.registerDir(SharedSpark.sf)
    eng
  }

  private def mustFail(sql: String): Unit =
    test(s"rejects: ${sql.take(60)}") {
      intercept[Throwable] { g.query(sql).collect() }
    }

  // parse errors
  mustFail("SELECT")
  mustFail("SELECT FROM nation")
  mustFail("SELECT 1 +")
  mustFail("SELECT count(*) FROM nation GROUP BY")
  mustFail("SELEC 1")
  // (note: `FROM nation WHERE` is NOT an error — Spark's parser accepts
  // non-enforced reserved keywords as table aliases)

  // resolution errors
  mustFail("SELECT nonexistent_col FROM nation")
  mustFail("SELECT * FROM no_such_table_xyz")
  mustFail("SELECT unknown_function_xyz(1)")
  mustFail("SELECT n_name FROM nation GROUP BY n_regionkey")
  mustFail("SELECT t.x FROM (SELECT 1 AS y) t")
  mustFail("SELECT * FROM $no_such_virtual")

  // type errors
  mustFail("SELECT 1 + array(1, 2)")
  mustFail("SELECT sum(n_name) FROM nation")
  mustFail("SELECT explode(42)")

  // dialect-layer errors
  mustFail("SELECT count(*) FROM events FOR DATES IN BOGUS_RANGE")
  mustFail("SELECT * FROM 'nonexistent/path/file.parquet'")

  // ANSI runtime errors must surface, not corrupt
  mustFail("SELECT CAST('not a number' AS INT) AS v")
  mustFail("SELECT element_at(array(1), 5)")
}
