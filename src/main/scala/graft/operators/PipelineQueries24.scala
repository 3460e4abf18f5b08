package graft.operators

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Pipeline coverage batch 24 — video-modality frame dedup:
  *
  *  - p100 video frame dedup: the frame-sampling plumbing
  *    ([[Multimodal.sampleFrames]] — the row-multiplying explode a video
  *    pipeline runs, decode stubbed per the env's no-codec limitation)
  *    feeding a frame-digest dedup ledger. Unlike p33's image tier (whose
  *    oracle checks SEED-cluster structure), the video payloads here are
  *    constructed so the frame digests themselves are derivable in pure
  *    SQL — the oracle recomputes every digest independently, so the
  *    whole plumbing (payload synthesis → per-frame digesting → keeper
  *    selection) is hash-checked end to end.
  */
object PipelineQueries24 {

  /** Frames sampled per video; videos share content iff doc_id % SeedMod
    * matches (the synthetic-corpus convention p33 established). */
  private val FramesPerVideo = 4
  private val SeedMod = 25

  val defs: Seq[QueryDef] = Seq(

    // ---------------------- video frame dedup (p100)

    // Scale shape: payload synthesis and frame sampling are row-local
    // (explode ×FramesPerVideo — exactly how a real sampler multiplies
    // rows ahead of a keyed dedup); the only shuffle moves 32-byte frame
    // digests keyed by digest. The keeper convention (min asset id) is
    // p01/p18's. A real deployment swaps the digest for a perceptual
    // frame hash (p33's aHash class) and nothing else changes.
    QueryDef("p100_video_frame_dedup", Some(s"""
      WITH v AS (
        SELECT doc_id AS asset_id,
               'video:' || CAST(doc_id % $SeedMod AS VARCHAR) AS pay
        FROM documents),
      f AS (
        SELECT asset_id, i AS frame_idx,
               md5(pay || CAST(i AS VARCHAR)) AS frame_digest
        FROM v CROSS JOIN range(0, $FramesPerVideo) t(i))
      SELECT frame_digest,
             CAST(min(asset_id) AS BIGINT) AS keeper,
             CAST(count(*) AS BIGINT) AS n_copies
      FROM f GROUP BY frame_digest
      ORDER BY keeper, frame_digest""")) { (s, dir) =>
      import s.implicits._
      val assets = Tables.dfSpread(s, dir, "documents")
        .select(col("doc_id").as("asset_id"),
          lit("video").as("kind"),
          concat(lit("video:"), (col("doc_id") % SeedMod).cast("string"))
            .cast("binary").as("payload"),
          lit("video/fake").as("mime"))
        .as[Multimodal.MediaAsset]
      Multimodal.sampleFrames(assets, FramesPerVideo)
        .groupBy(col("frame_digest"))
        .agg(min(col("asset_id")).as("keeper"), count(lit(1)).as("n_copies"))
        .orderBy(col("keeper"), col("frame_digest"))
    }
  )
}
