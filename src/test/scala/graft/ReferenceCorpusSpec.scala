package graft

import org.scalatest.funsuite.AnyFunSuite

/** Runs the reference engine's literal run-only SQL corpora (~1,155 user
  * statements — see ReferenceCorpus scaladoc) through `Graft.query` and
  * holds the result to the checked-in manifest:
  *   - `pass` statements must execute without error;
  *   - `gap` statements (3: hyphenated unquoted identifier, INTERVAL −
  *     TIMESTAMP typing, STRING/BOOLEAN CASE branches) must STILL fail, so
  *     a gap that silently starts working gets promoted instead of rotting;
  *   - every corpus statement must have a manifest row (regenerate with
  *     `sbt "Test/runMain graft.tools.RefCorpusTriage"` when the corpus
  *     changes).
  * The generated shapes battery probes the scanner's own edges;
  * this corpus is biased toward USER edges the reference accumulated from
  * years of bug reports — the two suites are complementary.
  */
class ReferenceCorpusSpec extends AnyFunSuite {
  private val spark = SharedSpark.spark
  private lazy val g = ReferenceCorpus.engine(spark, SharedSpark.sf)

  private val manifest: Map[(String, Int), (String, String)] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/battery/reference/manifest.tsv"), "UTF-8")
    try src.getLines().filterNot(l => l.startsWith("#") || l.trim.isEmpty).map { l =>
      val p = l.split("\t", 4)
      (p(0), p(1).toInt) -> (p(2), if (p.length > 3) p(3) else "")
    }.toMap
    finally src.close()
  }

  private val all = ReferenceCorpus.statements

  test(s"manifest covers the corpus (${all.size} statements)") {
    assert(all.size >= 1100, s"corpus shrank: ${all.size}")
    val missing = all.filterNot(st => manifest.contains((st.file, st.line)))
    assert(missing.isEmpty,
      s"statements without a manifest row (re-run RefCorpusTriage): " +
        missing.take(5).map(st => s"${st.file}:${st.line}").mkString(", "))
    val passRate = manifest.valuesIterator.count(_._1 == "pass").toDouble / manifest.size
    assert(passRate >= 0.8, f"corpus pass rate $passRate%.2f below the 80%% bar")
  }

  ReferenceCorpus.files.foreach { file =>
    test(s"$file.run_tests matches its manifest") {
      val failures = scala.collection.mutable.ArrayBuffer.empty[String]
      all.filter(_.file == file).foreach { st =>
        val expected = manifest.getOrElse((st.file, st.line), ("pass", ""))._1
        val outcome =
          try { g.query(ReferenceCorpus.mapFixtures(st.sql)).count(); "pass" }
          catch { case e: Throwable => s"fail: ${Option(e.getMessage).getOrElse(e.getClass.getName).takeWhile(_ != '\n').take(160)}" }
        (expected, outcome) match {
          case ("pass", "pass") => ()
          case ("gap", o) if o != "pass" => ()
          case ("gap", _) =>
            failures += s"${st.file}:${st.line} documented gap now PASSES — promote in manifest: ${st.sql.take(80)}"
          case (_, o) =>
            failures += s"${st.file}:${st.line} $o :: ${st.sql.take(100)}"
        }
      }
      assert(failures.isEmpty, failures.mkString("\n"))
    }
  }
}
