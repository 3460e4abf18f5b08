package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TruthTier

/** The truth-tier contract (r15 VERDICT #3): a documented verification
  * baseline admits bounded corpora unchanged and REFUSES oversized ones
  * fast, naming its scale-path twin — so no gate entry keeps a default
  * plan that is measured not to finish at 100x.
  */
class TruthTierSpec extends AnyFunSuite {
  private val spark = SharedSpark.spark
  import spark.implicits._

  test("guard passes a bounded corpus through unchanged") {
    val df = (1L to 100L).toDF("id")
    val out = TruthTier.guard(df, "op", "twin", bound = 100L)
    assert(out eq df, "guard must return the input DataFrame itself")
    assert(out.count() == 100L)
  }

  test("guard refuses an oversized corpus with the contract error") {
    val df = (1L to 101L).toDF("id")
    val e = intercept[TruthTier.ExceededException] {
      TruthTier.guard(df, "p17_dedup_jaccard_capped",
        "p191_jaccard_prefix_filter", bound = 100L)
    }
    assert(e.op == "p17_dedup_jaccard_capped")
    assert(e.twin == "p191_jaccard_prefix_filter")
    assert(e.bound == 100L && e.actual == 101L)
    assert(e.getMessage.contains("p191_jaccard_prefix_filter"),
      "refusal must name the scale-path twin")
    assert(e.getMessage.contains("truth-tier"))
  }

  test("the eight truth tiers run under their bounds at gate scale") {
    // The bounds must admit every tier the contract is measured at; the
    // gate corpora are far inside them (sf0.001 here; sf0.1 and the 10x
    // synth tier are admitted by construction of the constants). The four
    // r17 additions are the dedup-sweep/audit ops whose pair bases share
    // (or dominate) p17's full-blocking shape: p55's hinted broadcast
    // OOM'd the 100x session outright before its guard existed.
    for (op <- Seq("p04_dedup_jaccard", "p05_dedup_embedding",
        "p17_dedup_jaccard_capped", "p160_idf_weighted_jaccard",
        "p55_dedup_audit", "p77_band_tuning",
        "p80_dedup_threshold_sweep", "p105_containment_dedup")) {
      val df = SparkEntry.queries(op)(spark, SharedSpark.sf)
      assert(df.columns.nonEmpty, s"$op must still plan under its bound")
    }
    assert(TruthTier.documentsBound >= 50000L,
      "documents bound must admit the 10x synth tier (50k docs)")
    assert(TruthTier.embeddingsBound >= 20000L,
      "embeddings bound must admit the 10x synth tier (20k vectors)")
  }

  test("every oracle-gate corpus sits under the truth-tier bounds") {
    // The capped Scala plans diverge from the unbounded oracle SQL only
    // PAST the bound — safe only because the oracle never runs there
    // (r16 ADVICE). Pin that invariant: both scales the DuckDB oracle
    // actually executes at (the driver's sf0.01 gate and the sf0.1 bench
    // tier) must stay under every bound, so a future testdata regeneration
    // cannot silently open the divergence window.
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = spark.read.parquet(s"$sf/documents.parquet").count()
      val vecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
      assert(docs <= TruthTier.documentsBound,
        s"$sf documents ($docs) exceeds the truth-tier bound " +
          s"${TruthTier.documentsBound} — the oracle would run where the " +
          "guarded Scala plan refuses")
      assert(vecs <= TruthTier.embeddingsBound,
        s"$sf embeddings ($vecs) exceeds the truth-tier bound " +
          s"${TruthTier.embeddingsBound}")
    }
  }
}
