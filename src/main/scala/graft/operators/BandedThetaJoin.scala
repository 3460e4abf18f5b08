package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Banded decomposition of a `>` theta join + count aggregate — the
  * scale-safe plan behind q15_join_theta (reference theta join:
  * opteryx/operators/non_equi_join_node.py:38-120; Spark's native plan for
  * a non-equi join is an O(n·m) BroadcastNestedLoopJoin).
  *
  * `poorerCount(keyed, other)` computes, per `key` row of `keyed(key, v)`,
  * how many rows of `other(w)` have `w < v`, by bucketing both sides into
  * fixed-width bands of the value axis:
  *   (a) rows in bands STRICTLY BELOW a key's band are all smaller — counted
  *       once per band and cumulated over the tiny band dimension, then
  *       broadcast-joined back (the heavy sides are touched only by
  *       per-band partial aggregates);
  *   (b) SAME-band pairs get the exact compare inside an equi-join on the
  *       band id — O(n·m / #bands) instead of O(n·m).
  *
  * NULL values are excluded up front on both sides: a NULL comparison joins
  * nothing in the theta spelling, but floor(NULL/width) would land such
  * rows in a band that the cumsum counts as below (round-4 ADVICE;
  * BandedThetaJoinSpec proves result-identity against the NLJ baseline on
  * NULL-bearing data).
  *
  * Output: `(key, n_poorer)` for keys with `n_poorer > 0` — identical to
  * `keyed JOIN other ON v > w GROUP BY key` (inner-join semantics drop
  * zero-match keys).
  */
object BandedThetaJoin {

  def poorerCount(keyed: DataFrame, other: DataFrame,
      key: String, v: String, w: String, bandWidth: Double): DataFrame = {
    // Band ids are long: an int cast would throw under ANSI (or wrap and
    // corrupt the below-band cumsum) once |v|/bandWidth exceeds Int range —
    // the band dimension stays tiny either way.
    val sup = keyed
      .filter(col(v).isNotNull)
      .select(col(key), col(v), floor(col(v) / bandWidth).cast("long").as("sb"))
    val cust = other
      .filter(col(w).isNotNull)
      .select(col(w), floor(col(w) / bandWidth).cast("long").as("cb"))
    // Tiny band dimension (|domain|/bandWidth rows): per-band counts,
    // cumulated to "rows strictly below band b". The single-partition
    // window is over this dimension, never the data. Bands present only on
    // the keyed side still need a row (their below-count is the cumsum),
    // hence the union of both sides.
    val buckets = sup.select(col("sb").as("b")).distinct()
      .union(cust.select(col("cb").as("b")).distinct()).distinct()
    val perBucket = cust.groupBy(col("cb")).agg(count(lit(1)).as("bn"))
    val below = buckets.join(perBucket, col("b") === col("cb"), "left")
      .select(col("b"), coalesce(col("bn"), lit(0L)).as("bn"))
      .withColumn("below", coalesce(
        sum(col("bn")).over(Window.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("b").as("sb"), col("below"))
    val fromBelow = sup.join(broadcast(below), Seq("sb"), "left")
      .select(col(key), coalesce(col("below"), lit(0L)).as("part"))
    val fromSame = sup
      .join(cust, col("sb") === col("cb") && col(v) > col(w))
      .groupBy(col(key)).agg(count(lit(1)).as("part"))
    fromBelow.unionByName(fromSame)
      .groupBy(col(key)).agg(sum(col("part")).as("n_poorer"))
      .filter(col("n_poorer") > 0)
  }
}
