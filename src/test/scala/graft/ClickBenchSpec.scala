package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every ClickBench-shaped statement must execute through the dialect
  * pipeline — the perf corpus can't silently rot between rounds. */
class ClickBenchSpec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  ClickBench.statements.foreach { case (name, sql) =>
    test(s"$name executes: ${sql.take(68)}") {
      val df = ClickBench.queries(name)(spark, SharedSpark.sf)
      assert(df.columns.nonEmpty)
      df.write.format("noop").mode("overwrite").save()
    }
  }
}
