package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-aware equi-join: hot-key isolation + salting for the join shapes
  * AQE's skew handling cannot fix.
  *
  * Spark's own AQE (`spark.sql.adaptive.skewJoin.enabled`, on by default in
  * [[graft.GraftSession]]) already splits oversized partitions of a
  * sort-merge join at runtime, and a broadcast-hash join is immune to probe
  * skew — those cover most skew. What they cannot cover is a shuffled hash /
  * sort-merge join where ONE build-side key group is itself too large for an
  * executor (AQE can split probe partitions, but every probe split still
  * reads the whole hot build group), or engines/stages where AQE is off.
  * The classic remedy is salting: replicate the hot keys' build rows k ways,
  * scatter the hot probe rows across the k replicas, and join on
  * (key, salt) so the hot group becomes k groups of 1/k size.
  *
  * This implementation salts ONLY the hot keys (full-table salting would
  * multiply the entire build side k times): one partial-aggregated count
  * pass finds keys above `hotThreshold` (a bounded-tiny set BY DEFINITION —
  * a key is hot because it owns a macroscopic share of the rows, so there
  * can only be a handful), that set is broadcast to split both inputs, and
  * the cold remainder joins unsalted. Everything is distributed: no driver
  * collect, the only new shuffles are the split semi/anti probes against a
  * broadcast set, and the output is the exact multiset the plain join
  * produces.
  *
  * With the default `deterministic = true`, identical duplicate probe rows
  * hash to the same salt and therefore land on the same replica — salting
  * spreads distinct rows of a hot key, not copies of one row
  * (indistinguishable rows cannot be separated deterministically). Pass
  * `deterministic = false` to salt with `rand()` instead: exact duplicates
  * then spread uniformly, at the price that a retried lost task re-assigns
  * rows differently (safe for an inner join's multiset result, but
  * downstream consumers must not depend on row placement).
  */
object SkewJoin {

  /** Inner equi-join of `probe` and `build` on `keys`, salting keys whose
    * probe-side row count reaches `hotThreshold` across `saltFactor`
    * replicas. Result multiset equals `probe.join(build, keys)`. */
  def skewAwareJoin(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      hotThreshold: Long,
      saltFactor: Int = 16,
      deterministic: Boolean = true): DataFrame = {
    val hot = hotKeys(probe, keys, hotThreshold).select(keys.map(col): _*)
    joinWithHotSet(probe, build, keys, hot, saltFactor, deterministic)
  }

  /** [[skewAwareJoin]] with the hot threshold expressed as a FRACTION of the
    * probe's total row count — the form that stays meaningful across data
    * scales (an absolute row threshold tuned at one SF silently salts
    * everything, or nothing, at another). The total rides along as a
    * broadcast 1-row cross join over the per-key counts, never a driver
    * collect. */
  def skewAwareJoinByFraction(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      hotFraction: Double,
      saltFactor: Int = 16,
      deterministic: Boolean = true): DataFrame = {
    require(hotFraction > 0.0 && hotFraction <= 1.0, "hotFraction must be in (0, 1]")
    val kc = keys.map(col)
    val counts = probe.groupBy(kc: _*).agg(count(lit(1)).as("__n"))
    val tot = counts.agg(sum(col("__n")).as("__tot"))
    val hot = counts.crossJoin(broadcast(tot))
      .filter(col("__n") >= col("__tot") * hotFraction)
      .select(kc: _*)
    joinWithHotSet(probe, build, keys, hot, saltFactor, deterministic)
  }

  private def joinWithHotSet(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      hot: DataFrame,
      saltFactor: Int,
      deterministic: Boolean): DataFrame = {
    require(keys.nonEmpty, "skewAwareJoin needs at least one join key")
    require(saltFactor > 1, "saltFactor must be > 1")
    // Salt for probe rows: by default a hash of the whole row, so retries
    // of a lost task re-assign identically; rand() on request when spreading
    // exact duplicate rows matters more than retry-determinism.
    val probeSalt =
      if (deterministic) pmod(xxhash64(probe.columns.map(col): _*), lit(saltFactor.toLong))
      else (rand() * saltFactor).cast("long")
    val probeHot = probe.join(broadcast(hot), keys, "left_semi")
      .withColumn("__salt", probeSalt)
    val probeCold = probe.join(broadcast(hot), keys, "left_anti")
    val buildHot = build.join(broadcast(hot), keys, "left_semi")
      .withColumn("__salt",
        explode(array((0 until saltFactor).map(i => lit(i.toLong)): _*)))
    val buildCold = build.join(broadcast(hot), keys, "left_anti")
    probeHot.join(buildHot, keys :+ "__salt").drop("__salt")
      .unionByName(probeCold.join(buildCold, keys))
  }

  /** The hot-key set `skewAwareJoin` would salt — exposed for audits and
    * threshold tuning (e.g. joined back against per-key byte estimates). */
  def hotKeys(df: DataFrame, keys: Seq[String], hotThreshold: Long): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") >= hotThreshold)
}
