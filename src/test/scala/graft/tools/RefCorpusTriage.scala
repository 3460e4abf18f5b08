package graft.tools

import graft.{ReferenceCorpus, SharedSpark}

/** Triage runner for the reference run-only corpus: executes every
  * statement and writes `/tmp/refcorpus_triage.tsv`
  * (`file  line  status  message  sql`) — the raw material for
  * battery/reference/manifest.tsv. Run with
  * `sbt "Test/runMain graft.tools.RefCorpusTriage"`.
  */
object RefCorpusTriage {
  def main(args: Array[String]): Unit = {
    val spark = SharedSpark.spark
    val g = ReferenceCorpus.engine(spark, SharedSpark.sf)
    val out = new java.io.PrintWriter("/tmp/refcorpus_triage.tsv")
    var pass = 0
    var fail = 0
    val t0 = System.nanoTime()
    ReferenceCorpus.statements.foreach { st =>
      val res =
        try { g.query(ReferenceCorpus.mapFixtures(st.sql)).count(); None }
        catch { case e: Throwable =>
          Some(Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\\t\\n\\r]", " ").take(300)) }
      res match {
        case None => pass += 1
          out.println(s"${st.file}\t${st.line}\tpass\t\t${st.sql}")
        case Some(msg) => fail += 1
          out.println(s"${st.file}\t${st.line}\tfail\t$msg\t${st.sql}")
      }
    }
    out.close()
    println(f"TRIAGE pass=$pass fail=$fail total=${pass + fail} " +
      f"secs=${(System.nanoTime() - t0) / 1e9}%.0f -> /tmp/refcorpus_triage.tsv")
    spark.stop()
  }
}
