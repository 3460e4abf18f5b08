package graft

import org.scalatest.funsuite.AnyFunSuite

/** Shape battery — the reference's tier-2 test style ("throw queries at it",
  * assert (rows, columns) shapes; reference:
  * tests/integration/sql_battery/test_shapes_basic.py). Statements live in
  * src/test/resources/battery/shapes.tsv as `rows<TAB>cols<TAB>sql`;
  * rows -1 = any count >= 1, 0 = must be empty. Every statement runs through
  * the full dialect pipeline (Graft.query).
  */
class ShapesBatterySpec extends AnyFunSuite {
  private val spark = SharedSpark.spark
  private lazy val g = {
    val eng = Graft(spark)
    eng.registerDir(SharedSpark.sf)
    eng
  }

  private val corpus: Seq[(Long, Int, String, Int)] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/battery/shapes.tsv"), "UTF-8")
    try src.getLines().zipWithIndex
      .filter { case (l, _) => l.trim.nonEmpty && !l.startsWith("#") }
      .map { case (l, i) =>
        val Array(rows, cols, sql) = l.split("\t", 3)
        (rows.trim.toLong, cols.trim.toInt, sql.trim, i + 1)
      }.toSeq
    finally src.close()
  }

  test(s"battery loads (${corpus.size} statements)") {
    assert(corpus.size >= 1200)
  }

  corpus.foreach { case (expRows, expCols, sql, line) =>
    test(s"shapes.tsv:$line ${sql.take(72)}") {
      val df = g.query(sql)
      assert(df.columns.length == expCols,
        s"expected $expCols columns, got ${df.columns.toSeq}")
      val n = df.count()
      if (expRows == -1) assert(n >= 1, s"expected >=1 rows, got $n")
      else assert(n == expRows, s"expected $expRows rows, got $n")
    }
  }
}
