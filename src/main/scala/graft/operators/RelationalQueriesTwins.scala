package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Documented-baseline twins of gate queries whose shipped plan replaces a
  * naive execution strategy with a scale-safe one. The twin keeps the naive
  * plan alive so specs can assert result-identity between the two shapes.
  */
object RelationalQueriesTwins {

  /** The O(n·m) BroadcastNestedLoopJoin baseline for q15_join_theta
    * (reference: opteryx/operators/non_equi_join_node.py:38-120). Correct and
    * fine on a dimension-sized side; the gate ships the banded-range
    * decomposition instead (RelationalQueries q15), which is result-identical
    * — QueriesSpec asserts equality against this twin.
    */
  def thetaJoinNlj(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables.df(s, dir, "supplier")
    val c = Tables.df(s, dir, "customer")
    sup.join(c, col("s_acctbal") > col("c_acctbal"))
      .groupBy(col("s_suppkey"))
      .agg(count(lit(1)).as("n_poorer"))
      .orderBy(col("s_suppkey"))
  }
}
