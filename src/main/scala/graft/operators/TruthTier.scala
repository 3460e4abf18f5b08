package graft.operators

import org.apache.spark.sql.DataFrame

/** Contract enforcement for the documented truth-tier (verification
  * baseline) operators — the ops whose DEFAULT plan is intentionally
  * quadratic because their job is to be exactly right on a bounded corpus,
  * not to scale: the all-pairs Jaccard baselines (p04), the all-pairs
  * embedding near-dup baseline (p05), and the full-rare-shingle-blocking
  * Jaccard tiers (p17/p160) whose byte-identical scale-path twins are the
  * prefix-filtered p191/p192 (`PipelineQueries49`, equality pinned at two
  * scales in `PrefixFilterTwinSpec`).
  *
  * Round-15 VERDICT #3 measured what round 14 projected: p17/p160's full
  * blocking did NOT finish a 100x corpus in a ~25-minute budget while the
  * twins finished in ~160 s. The round-16 rule is that no gate entry may
  * keep a default plan that is KNOWN not to finish at 100x: a truth tier
  * now declares its input bound and REFUSES an oversized corpus in O(count)
  * time with an error naming its scale-path twin, instead of silently
  * launching a job that will never come back. (An open-ended cap-raise is
  * deliberately not offered: past the bound the twin IS the same result,
  * provably — `PrefixFilterTwinSpec` — so there is nothing the unbounded
  * original computes that the twin does not.)
  *
  * The bounds admit every tier the contract is measured at — the
  * sf0.01/sf0.1 gate (500/5,000 docs, 500/2,000 vectors) and ScaleCheck's
  * 10x synth tier (50,000 docs / 20,000 vectors) — and refuse the 100x
  * tier (500,000 docs / 200,000 vectors), where `bench_sf10_synth.json`
  * records the measured DNF and the twins' ~160 s rows.
  */
object TruthTier {

  /** Raised when a truth-tier op is handed a corpus past its documented
    * bound. ScaleCheck catches this type specifically and records the row
    * as contract-excluded rather than failed. */
  final class ExceededException(
      val op: String, val twin: String, val bound: Long, val actual: Long,
      val relation: String =
        "byte-identical results, bucketed plan (PrefixFilterTwinSpec)")
    extends RuntimeException(
      s"$op is a capped truth-tier verification baseline (input bound " +
        s"$bound rows, got $actual); its default plan is measured not to " +
        s"finish at this scale. Use its scale-path twin $twin — $relation " +
        s"(bench_sf10_synth.json).")

  /** Corpus bound for the documents-table truth tiers (p04/p17/p160):
    * covers the gate and the 10x synth tier with 2x headroom. */
  val documentsBound = 100000L

  /** Corpus bound for the all-pairs embedding baseline (p05): 20k vectors
    * (the 10x tier) is ~200M pairs — the measured edge of the acceptable
    * verification budget; 10x more is 100x more pairs. */
  val embeddingsBound = 50000L

  /** Eagerly counts `df` (one metadata-cheap job on a parquet scan) and
    * either returns it unchanged or refuses with [[ExceededException]].
    * The count is the price of an enforced contract — micro against the
    * quadratic work the op does on an admitted corpus, and the refusal
    * path is the entire point on an oversized one. */
  def guard(df: DataFrame, op: String, twin: String, bound: Long,
      relation: String =
        "byte-identical results, bucketed plan (PrefixFilterTwinSpec)")
      : DataFrame = {
    val n = df.count()
    if (n > bound) throw new ExceededException(op, twin, bound, n, relation)
    df
  }
}
