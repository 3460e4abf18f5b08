package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact continuous percentiles via a bounded-domain value histogram.
  *
  * Spark's built-in `percentile`/`median` compile to a
  * TypedImperativeAggregate that collects EVERY value of a group into a
  * single aggregation buffer — at 100 TB a 3-group lineitem median would
  * buffer tens of GB per group in one buffer on one task. This helper keeps
  * hash-exactness while bounding state by the number of DISTINCT values
  * (the value domain), not the row count:
  *
  *   1. `groupBy(key, value)` → per-(key,value) counts. Partial (map-side)
  *      aggregation collapses the row volume before the only data-sized
  *      shuffle; state per task is one counter per distinct (key,value).
  *   2. A cumulative-count window over the tiny per-key histogram finds the
  *      value(s) covering the target rank, and a final reduce interpolates —
  *      identical math to the reference's exact quantile
  *      (opteryx third-party sketch fallback aside): sorted 0-based rank
  *      `pos = p * (n-1)`, result `v_lo + (v_hi - v_lo) * frac`.
  *
  * Correct for any input; efficient whenever the value domain is bounded
  * (integral quantities, fixed-point prices) — the per-key histogram the
  * window sorts is tiny even when the group itself is billions of rows.
  *
  * ==Choosing a variant==
  *
  * Two shapes, one decision rule — is the VALUE DOMAIN bounded?
  *
  *  - [[percentiles]] / [[fromHistogram]] (one-level histogram): use when
  *    distinct values per key are bounded and small relative to the rows
  *    (integral quantities, enum codes, fixed-point values on a narrow
  *    range). One scan, one shuffle of (key, value) counts; state = the
  *    distinct-value histogram. On a HIGH-cardinality domain (raw prices,
  *    timestamps, doubles) this silently degenerates: partial aggregation
  *    collapses nothing and the shuffle is data-sized.
  *  - [[refined]] / [[refinedDynamic]] (two-phase bucketed selection): use
  *    for high-cardinality domains. Two scans, but every shuffle is
  *    BUCKET-bounded (phase A ships per-bucket counts; phase B ships only
  *    the rows of the ≤2 candidate buckets per target) — survives a 100x
  *    scale-up where the one-level histogram's shuffle grows with the data.
  *
  * q76 groups a 50-value integral domain → one-level. q41's p90 over
  * l_extendedprice (~every value distinct) → two-phase. When unsure,
  * two-phase: its overhead on a bounded domain is one extra scan; the
  * one-level form's failure mode on an unbounded domain is a data-sized
  * shuffle.
  */
object ExactPercentile {

  /** Exact percentile(s) of one value column per group.
    *
    * Precondition (efficiency, not correctness): the value domain should be
    * bounded — see "Choosing a variant" above. High-cardinality values make
    * the (key, value) shuffle data-sized; use [[refined]] there.
    *
    * @param ps (fraction, outputColumn) pairs, e.g. `Seq(0.5 -> "med")`.
    * @return one row per distinct key: (keyCol, outputs...)
    */
  def percentiles(
      df: DataFrame,
      keyCol: String,
      value: Column,
      ps: Seq[(Double, String)]): DataFrame = {
    val hist = df
      .filter(value.isNotNull)
      .groupBy(col(keyCol), value.cast("double").as("__v"))
      .agg(count(lit(1)).as("__c"))
    fromHistogram(hist, keyCol, ps)
  }

  /** Same selection over a caller-built histogram: `hist` must carry
    * (keyCol, __v double, __c long) and may carry extra per-(key,value)
    * partial aggregates that `extraAggs` re-combines in the final reduce
    * (e.g. a partial bool_and re-aggregated with bool_and) — this lets one
    * scan feed both the percentile and the group's other aggregates.
    */
  def fromHistogram(
      hist: DataFrame,
      keyCol: String,
      ps: Seq[(Double, String)],
      extraAggs: Seq[Column] = Nil): DataFrame = {
    require(ps.nonEmpty || extraAggs.nonEmpty,
      "fromHistogram needs at least one percentile fraction or extra aggregate " +
        "(both ps and extraAggs were empty)")
    val byVal = Window.partitionBy(col(keyCol)).orderBy(col("__v"))
    // Same partition+order spec with an unbounded frame → Catalyst computes
    // both sums in ONE Window operator over one sort, no second pass.
    val whole = byVal.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = hist
      .withColumn("__cum", sum(col("__c")).over(byVal))
      .withColumn("__n", sum(col("__c")).over(whole))
    // A histogram row holds the values at 0-based ranks [cum-c, cum); the row
    // covering rank r is the unique one with cum-c <= r < cum, so the
    // conditional max() below picks exactly one value per group.
    val aggs = ps.flatMap { case (p, name) =>
      val pos = lit(p) * (col("__n") - 1).cast("double")
      val lo = floor(pos)
      val hi = ceil(pos)
      def at(r: Column): Column =
        max(when(col("__cum") - col("__c") <= r && col("__cum") > r, col("__v")))
      Seq(
        at(lo).as(s"__lo_$name"),
        at(hi).as(s"__hi_$name"),
        max(pos - lo).as(s"__frac_$name")) // constant within a group
    }
    val all = aggs ++ extraAggs
    val picked = cum.groupBy(col(keyCol)).agg(all.head, all.tail: _*)
    val outs = ps.map { case (_, name) =>
      val loV = col(s"__lo_$name")
      val hiV = col(s"__hi_$name")
      (loV + (hiV - loV) * col(s"__frac_$name")).as(name)
    }
    val extraCols = if (extraAggs.isEmpty) Nil
      else picked.columns.takeRight(extraAggs.size).toSeq.map(col)
    picked.select(col(keyCol) +: (outs ++ extraCols): _*)
  }

  /** Two-phase exact percentile for HIGH-cardinality value domains.
    *
    * When nearly every value is distinct (e.g. prices), the one-level
    * histogram above degenerates: partial aggregation can't collapse rows,
    * so the shuffle is data-sized. This variant shuffles only bounded state:
    *
    *   Phase A: count rows per (key, coarse bucket) — map-side combine
    *     collapses to ~#buckets rows; a cumulative window over the tiny
    *     bucket list locates the bucket(s) containing each target rank and
    *     the count of rows below them.
    *   Phase B: re-scan joined against the broadcast target-bucket list —
    *     only rows inside candidate buckets survive (a vanishing fraction),
    *     then an exact within-bucket histogram + the phase-A below-count
    *     yields the value at each global rank, interpolated as in
    *     [[percentiles]].
    *
    * Two scans, but every shuffle is bucket-bounded — this survives a 100×
    * scale-up where the one-level histogram's distinct-value shuffle grows
    * with the data. `bucket` must be order-preserving (monotone in value).
    */
  def refined(
      df: DataFrame,
      keyCol: String,
      value: Column,
      ps: Seq[(Double, String)],
      bucket: Column => Column = v => floor(v / 100.0)): DataFrame = {
    require(ps.size == 1, "refined computes one fraction per call; use percentiles for several")
    val (p, name) = ps.head
    val prepared = df
      .filter(value.isNotNull)
      .select(col(keyCol), value.cast("double").as("__v"))
      .withColumn("__b", bucket(col("__v")).cast("long"))
      .withColumn("__p", lit(p))
    refinedDynamic(prepared, Seq(keyCol), out = name)
  }

  /** Generalized two-phase selection over caller-prepared rows.
    *
    * `prepared` must carry `keyCols`, `__v` (double value), `__b` (long,
    * order-preserving bucket of `__v`) and `__p` (target fraction, constant
    * within each key group). Several measures can share ONE scan by melting
    * them into a measure-id key column with per-measure `__p`/`__b` —
    * that is how q41 computes a median and a p90 over different columns
    * with a single pass of lineitem per phase.
    *
    * Returns one row per key group: (keyCols..., `out`).
    */
  def refinedDynamic(
      prepared: DataFrame,
      keyCols: Seq[String],
      out: String = "res"): DataFrame = {
    val coarse = prepared
      .groupBy(keyCols.map(col) :+ col("__b"): _*)
      .agg(count(lit(1)).as("__c"), first(col("__p")).as("__p")) // __p constant per key group
    refinedFromCoarse(coarse, prepared, keyCols, out)
  }

  /** Phase B of [[refinedDynamic]] over a CALLER-BUILT phase-A histogram.
    *
    * `coarse` must carry (keyCols..., __b, __c count, __p fraction) — one
    * row per (key, bucket) — and may carry extra partial-aggregate columns
    * the caller re-reduces itself (both consumers then read the same
    * shuffle via exchange reuse, so e.g. q41's bool_and/bool_or/min ride
    * phase A's pass instead of paying their own scan). `prepared` is the
    * row-level input phase B re-scans for candidate-bucket values.
    */
  def refinedFromCoarse(
      coarseIn: DataFrame,
      prepared: DataFrame,
      keyCols: Seq[String],
      out: String = "res"): DataFrame =
    selectFromCum(cumulate(coarseIn, keyCols), prepared, keyCols, out)

  /** Cumulative/total counts over a phase-A histogram: appends `__cum` and
    * `__n` to `coarseIn` (which must carry keyCols, __b, __c, __p and may
    * carry extra columns — they pass through untouched). Split out so a
    * caller can `localCheckpoint` the RESULT and feed it to BOTH
    * [[selectFromCum]] and its own re-reduce of extra partial aggregates:
    * the window then runs inside the one materializing job instead of once
    * per consumer (q41 does this — the checkpointed frame is bucket-bounded
    * state, never data-sized).
    */
  def cumulate(coarseIn: DataFrame, keyCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    val byB = Window.partitionBy(keys: _*).orderBy(col("__b"))
    val whole = byB.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // Same partition+order spec → Catalyst computes both sums in ONE Window
    // operator over one sort.
    coarseIn
      .withColumn("__cum", sum(col("__c")).over(byB))
      .withColumn("__n", sum(col("__c")).over(whole))
  }

  /** One-scan multi-measure phase B over a [[cumulate]]d histogram.
    *
    * [[selectFromCum]] probes with caller-melted rows — one row per
    * (source row, measure) — so the probe side doubles (or ×M) the scan.
    * This variant joins the RAW rows once against the broadcast target
    * list and computes each row's bucket for the measure of the target
    * row it is compared with, so the probe side stays one row per source
    * row with no explode. Per-row fanout is bounded by the target rows of
    * its key group (≤ 2 buckets per measure — the floor/ceil ranks), so
    * the join emits candidate rows only and the whole phase stays
    * broadcast-sized above the scan.
    *
    * `cum` must be cumulated over `keyCols :+ "__m"` where `__m` is the
    * integer measure id; `measures` maps id → (value, bucket) expressions
    * over `data`'s columns (bucket order-preserving in value, as always).
    * Returns (keyCols..., __m, `out`) — one row per (key, measure).
    */
  def selectMultiMeasureFromCum(
      cum: DataFrame,
      data: DataFrame,
      keyCols: Seq[String],
      measures: Seq[(Int, Column, Column)],
      out: String = "res"): DataFrame = {
    val groupKeys = keyCols :+ "__m"
    val keys = groupKeys.map(col)
    val posA = col("__p") * (col("__n") - 1).cast("double")
    val wanted = Seq(floor(posA), ceil(posA))
      .map(r => col("__cum") - col("__c") <= r && col("__cum") > r)
      .reduce(_ || _)
    // Rename every target column — keys AND service columns — so probe-side
    // names stay unambiguous even when `data` itself carries __below/__n/__p
    // (a caller-prepared frame may: refinedDynamic's does).
    val targets = cum
      .filter(wanted)
      .select(groupKeys.map(k => col(k).as(s"__t_$k")) ++ Seq(col("__b").as("__t_b"),
        (col("__cum") - col("__c")).as("__t_below"), col("__n").as("__t_n"),
        col("__p").as("__t_p")): _*)
    def bySwitch(f: ((Int, Column, Column)) => Column): Column =
      measures.foldRight(lit(null).cast("double")) { case (m, acc) =>
        when(col("__t___m") === m._1, f(m)).otherwise(acc)
      }
    val cond = (keyCols.map(k => col(k) === col(s"__t_$k")) :+
      (bySwitch(_._3).cast("long") === col("__t_b"))).reduce(_ && _)
    val cand = data.join(broadcast(targets), cond)
      .select(keyCols.map(col) ++ Seq(col("__t___m").as("__m"),
        bySwitch(_._2).cast("double").as("__v"),
        col("__t_below").as("__below"), col("__t_n").as("__n"),
        col("__t_p").as("__p")): _*)
    val packed = cand
      .groupBy(keys: _*)
      .agg(
        sort_array(collect_list(col("__v"))).as("__vs"),
        min(col("__below")).as("__start"),
        min(col("__n")).as("__nn"),
        first(col("__p")).as("__pp"))
    val pos = col("__pp") * (col("__nn") - 1).cast("double")
    val lo = floor(pos)
    def at(r: Column): Column =
      element_at(col("__vs"), (r - col("__start")).cast("int") + 1)
    val vLo = at(lo)
    val vHi = at(ceil(pos))
    packed.select(keys :+ (vLo + (vHi - vLo) * (pos - lo)).as(out): _*)
  }

  /** Phase-B selection over a [[cumulate]]d histogram. */
  def selectFromCum(
      cum: DataFrame,
      prepared: DataFrame,
      keyCols: Seq[String],
      out: String = "res"): DataFrame = {
    val keys = keyCols.map(col)
    val coarse = cum
      .select(keys ++ Seq(col("__b"), col("__c"), col("__p"), col("__cum"), col("__n")): _*)
    // A bucket holds global 0-based ranks [cum-c, cum); keep the bucket(s)
    // covering the target rank's floor and ceil.
    val posA = col("__p") * (col("__n") - 1).cast("double")
    val wanted = Seq(floor(posA), ceil(posA))
      .map(r => col("__cum") - col("__c") <= r && col("__cum") > r)
      .reduce(_ || _)
    // Service columns take a __t_ prefix so a prepared frame that already
    // carries __below/__n/__p can never bind ambiguously (keys and __b keep
    // their names — the USING join below dedups those).
    val targets = coarse
      .filter(wanted)
      .select(keys ++ Seq(col("__b"),
        (col("__cum") - col("__c")).as("__t_below"), col("__n").as("__t_n"),
        col("__p").as("__t_p")): _*)
    // __p rides the (tiny) target list, so `prepared` needs only keys+__b+__v
    // — phase B's data-sized probe stays as narrow as possible; the probe's
    // own __p (refinedDynamic's prepared carries one) is dropped as dead
    // weight.
    val cand = prepared.drop("__p").join(broadcast(targets), keyCols :+ "__b")
    // The candidate buckets cover two ADJACENT global ranks (floor/ceil of
    // one fractional position), so their union is rank-contiguous starting
    // at min(below): the sorted candidate values indexed from that offset
    // give the values at any covered global rank — no window, one tiny agg.
    val packed = cand
      .groupBy(keys: _*)
      .agg(
        sort_array(collect_list(col("__v"))).as("__vs"),
        min(col("__t_below")).as("__start"),
        min(col("__t_n")).as("__nn"),
        first(col("__t_p")).as("__pp"))
    val pos = col("__pp") * (col("__nn") - 1).cast("double")
    val lo = floor(pos)
    def at(r: Column): Column =
      element_at(col("__vs"), (r - col("__start")).cast("int") + 1)
    val vLo = at(lo)
    val vHi = at(ceil(pos))
    packed.select(keys :+ (vLo + (vHi - vLo) * (pos - lo)).as(out): _*)
  }
}
