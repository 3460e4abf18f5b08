package graft.operators

import org.apache.spark.sql.{DataFrame, Row}

/** Iterative UNION ALL recursion — the WITH RECURSIVE execution strategy
  * for frontier-bounded walks (Spark 4 executes `WITH RECURSIVE` natively
  * as a UnionLoop at ~5 scheduled jobs per iteration of local floor; q96's
  * walk was 154 sequential jobs of pure scheduling).
  *
  * Strategy ladder, chosen per iteration by the OBSERVED frontier size:
  *
  *  - While the frontier stays under `driverFrontierCap` rows, the loop is
  *    collect-paced: the frontier lives as a LocalRelation (broadcast-side
  *    of the step join, zero shuffle), and each iteration costs exactly ONE
  *    short job — the `take` that materializes the next frontier. Holding
  *    model-state-sized rows on the driver is the p62 discipline (loop
  *    control + a bounded state vector, never row data at corpus scale).
  *
  *  - The first time a frontier exceeds the cap, the loop PERMANENTLY
  *    switches to checkpoint-paced: frames localCheckpoint in executors and
  *    the driver sees only an emptiness probe. This is the shape that
  *    survives recursions whose frontier grows with the data (transitive
  *    closure over a big edge set) — same loop discipline as
  *    ConnectedComponents.
  *
  * The returned DataFrame is the lazy UNION ALL of every frame; downstream
  * aggregation runs as one distributed pass. Native `WITH RECURSIVE`
  * remains available through the SQL surface and is pinned equivalent in
  * RecursionSpec.
  *
  * @param base              the non-recursive seed term
  * @param step              the recursive term, applied to the previous
  *                          frontier only
  * @param maxIter           iteration cap (mirror the recursion's depth
  *                          guard); iteration also stops at the first empty
  *                          frontier
  * @param driverFrontierCap frontier size up to which the loop is
  *                          collect-paced (default 1024 rows)
  */
object Recursion {
  def unionAll(
      base: DataFrame,
      step: DataFrame => DataFrame,
      maxIter: Int,
      driverFrontierCap: Int = 1024): DataFrame = {
    val spark = base.sparkSession
    val schema = base.schema
    def local(rows: Array[Row]): DataFrame =
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

    val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var i = 0
    var done = false

    var rows = base.take(driverFrontierCap + 1)
    if (rows.length <= driverFrontierCap) {
      // collect-paced tier. local() rebinds collected rows POSITIONALLY
      // against base.schema, so step must preserve column order — the
      // require below fences that contract at the first application.
      if (rows.isEmpty) done = true else frames += local(rows)
      while (!done && i < maxIter && rows.length <= driverFrontierCap) {
        val stepped = step(local(rows))
        require(stepped.schema.fieldNames.sameElements(schema.fieldNames),
          s"Recursion.unionAll: step must preserve column order; got " +
            s"${stepped.schema.fieldNames.mkString(",")} vs base " +
            schema.fieldNames.mkString(","))
        rows = stepped.take(driverFrontierCap + 1)
        if (rows.isEmpty) done = true
        else if (rows.length <= driverFrontierCap) { frames += local(rows); i += 1 }
        // oversized: fall through to the checkpoint tier with `rows` intact
      }
    }
    if (!done && (rows.length > driverFrontierCap || frames.isEmpty)) {
      // checkpoint-paced tier: re-derive the oversized frontier lazily —
      // its rows never transit the driver again. The re-derived
      // step(frames.last) is the SAME application whose oversized result
      // just exited the collect tier — count it against maxIter so the
      // handoff doesn't grant an extra depth level.
      if (frames.nonEmpty) i += 1
      var frontier =
        (if (frames.isEmpty) base else step(frames.last)).localCheckpoint()
      frames += frontier
      while (!done && i < maxIter) {
        frontier = step(frontier).localCheckpoint()
        if (frontier.take(1).isEmpty) done = true else frames += frontier
        i += 1
      }
    }
    if (frames.isEmpty) base.limit(0)
    else frames.reduce(_ unionAll _)
  }
}
