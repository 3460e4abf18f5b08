package graft
/** Dev tool: dump formatted plans for scale-critical queries so pushdown,
  * join strategies, and shuffle counts can be audited per round. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_group_agg", "q07_join_inner", "q39_multijoin", "q40_tpch_q6", "p02_dedup_minhash", "p05_dedup_embedding")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
