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
  * Identical duplicate probe rows hash to the same salt and therefore land
  * on the same replica — salting spreads distinct rows of a hot key, not
  * copies of one row (indistinguishable rows cannot be separated
  * deterministically; pass `rand`-based salting explicitly if approximate
  * spread of exact duplicates matters more than retry-determinism).
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
      saltFactor: Int = 16): DataFrame = {
    require(keys.nonEmpty, "skewAwareJoin needs at least one join key")
    require(saltFactor > 1, "saltFactor must be > 1")
    val kc = keys.map(col)
    // Partial-agg count per key, keep only the hot ones: tiny by definition.
    val hot = probe.groupBy(kc: _*).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= hotThreshold)
      .select(kc: _*)
    // Deterministic salt for probe rows: hash of the whole row, so retries
    // of a lost task re-assign identically (rand() would not).
    val probeSalt = pmod(xxhash64(probe.columns.map(col): _*), lit(saltFactor.toLong))
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
