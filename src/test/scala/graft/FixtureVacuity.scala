package graft

import org.apache.spark.sql.DataFrame

/** Reusable fixture-vacuity probe (r16 VERDICT next-round #7): the synthetic
  * corpus has a ~31-token shared vocabulary and a constant 25 docs per
  * source, so a statistic keyed on vocabulary breadth, per-source doc
  * counts, or singleton frequencies can silently degenerate to a constant
  * (or NULL) and the op "passes" while discriminating nothing. Rounds 13–16
  * caught this by hand three times (p211 switched to bigrams, p219's
  * feature was an identity of y, p220's doc-count axis was constant); every
  * new batch spec asserts non-degeneracy through this helper instead.
  */
object FixtureVacuity {

  /** The op's discriminating statistic must take at least `minDistinct`
    * distinct non-null values across the result — a constant (or all-null)
    * column means the fixture does not exercise the op. For single-row
    * results use [[assertNonTrivial]] instead. */
  def assertDiscriminates(df: DataFrame, column: String,
      minDistinct: Int = 2): Unit = {
    val values = df.select(column).collect()
      .map(r => Option(r.get(0))).collect { case Some(v) => v }.distinct
    assert(values.length >= minDistinct,
      s"fixture-vacuity: '$column' takes only ${values.length} distinct " +
        s"non-null value(s) [${values.take(3).mkString(", ")}] — the corpus " +
        "does not exercise this statistic (see FixtureVacuity scaladoc)")
  }

  /** A single-row statistic must be non-null and different from the
    * listed degenerate values (typically 0 and ±1 for normalized stats
    * whose edge cases mean "nothing varied"). */
  def assertNonTrivial(df: DataFrame, column: String,
      degenerate: Seq[Double] = Seq(0.0)): Unit = {
    val rows = df.select(column).collect()
    assert(rows.nonEmpty, s"fixture-vacuity: empty result for '$column'")
    val v = rows.head.get(0)
    assert(v != null, s"fixture-vacuity: '$column' is NULL")
    val d = v.toString.toDouble
    assert(degenerate.forall(g => math.abs(d - g) > 1e-12),
      s"fixture-vacuity: '$column' = $d sits exactly on a degenerate value " +
        s"(${degenerate.mkString("/")}) — the corpus does not exercise it")
  }

  /** A count-like column must be strictly positive in at least one row —
    * zero everywhere means the branch under test never fired. */
  def assertSomewherePositive(df: DataFrame, column: String): Unit = {
    val any = df.select(column).collect()
      .exists(r => !r.isNullAt(0) && r.get(0).toString.toDouble > 0)
    assert(any, s"fixture-vacuity: '$column' is never positive — the " +
      "branch under test never fires on this corpus")
  }
}
