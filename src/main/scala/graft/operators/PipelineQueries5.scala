package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Pipeline coverage batch 5 — corpus-preparation stages downstream of
  * dedup/filtering: chunking documents into overlapping token windows
  * (retrieval / pretraining-sample prep) and computing temperature-scaled
  * source mixing weights (the sampling schedule a trainer consumes).
  *
  * Both plans are row-local or tiny-aggregate only: chunking is an explode
  * over a per-row start sequence (no shuffle until the final ORDER BY, which
  * exists for the oracle's determinism, not the semantics); mixing weights
  * reduce the corpus to one row per source before any non-trivial work.
  */
object PipelineQueries5 {

  private def toks(c: Column): Column = split(lower(c), "\\s+")

  /** Chunk geometry: 32-token windows every 24 tokens (8-token overlap) —
    * sized to the synthetic corpus (~54 tokens/doc ⇒ 2-3 chunks) so the
    * gate exercises multi-chunk docs, boundary truncation, and the
    * single-chunk short-doc case at once. */
  private val ChunkSize = 32
  private val ChunkStride = 24

  val defs: Seq[QueryDef] = Seq(

    // -------------------------------------------------- document chunking

    // Overlapping token-window chunking: every document becomes
    // ceil(n_tokens / stride) chunks of up to ChunkSize tokens starting
    // every ChunkStride tokens, each carrying its token offset, length, and
    // an md5 of the chunk text (the identity a retrieval index or a
    // span-dedup pass would key on — and a content-exact correctness
    // signal for the gate).
    //
    // Scale shape: chunk starts are a per-row `sequence` explode — entirely
    // row-local, no shuffle, no state; output size is a constant factor
    // (~n/stride) of the corpus. At 100 TB this is a map-only stage; the
    // trailing ORDER BY is the gate's determinism contract, not part of the
    // operator (a real pipeline writes chunks unordered).
    QueryDef("p30_doc_chunking", Some(s"""
      WITH t AS (
        SELECT doc_id, string_split_regex(lower(text), '\\s+') AS tk FROM documents),
      st AS (
        SELECT doc_id, tk,
               unnest(list_transform(range(0, CAST(len(tk) AS BIGINT), $ChunkStride),
                 x -> CAST(x AS BIGINT))) AS start
        FROM t)
      SELECT doc_id,
             CAST(start / $ChunkStride AS BIGINT) AS chunk_idx,
             start AS start_tok,
             CAST(least($ChunkSize, len(tk) - start) AS BIGINT) AS n_tok,
             md5(array_to_string(list_slice(tk, start + 1, start + $ChunkSize), ' ')) AS chunk_md5
      FROM st ORDER BY doc_id, chunk_idx""")) { (s, dir) =>
      val t = Tables.dfSpread(s, dir, "documents")
        .select(col("doc_id"), toks(col("text")).as("tk"))
      t.select(col("doc_id"), col("tk"),
          explode(sequence(lit(0L), size(col("tk")).cast("long") - 1L,
            lit(ChunkStride.toLong))).as("start"))
        .select(col("doc_id"),
          (col("start") / ChunkStride).cast("long").as("chunk_idx"),
          col("start").as("start_tok"),
          least(lit(ChunkSize), size(col("tk")) - col("start").cast("int")).cast("long").as("n_tok"),
          md5(concat_ws(" ", slice(col("tk"), (col("start") + 1).cast("int"), lit(ChunkSize))))
            .as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    // --------------------------------------------- source mixing weights

    // Temperature-scaled source mixing: the sampling weights a trainer uses
    // to rebalance heterogeneous sources. Raw token share per source is
    // flattened with exponent alpha (0 < alpha < 1 upsamples the tail —
    // alpha=1 is proportional, alpha=0 uniform), renormalized, and reported
    // with the effective epoch factor (weight/share — how many passes over
    // that source one corpus-epoch of sampling implies).
    //
    // Scale shape: one partial-aggregated groupBy collapses the corpus to
    // |sources| rows; everything after is arithmetic on that tiny frame
    // (the total rides along as a broadcast 1-row cross join, never a
    // driver collect). Map-side token counting is row-local.
    QueryDef("p31_mixing_weights", Some("""
      WITH per AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split_regex(lower(text), '\s+'))) AS BIGINT) AS tokens
        FROM documents GROUP BY source),
      tot AS (
        SELECT sum(tokens) AS all_tokens, sum(pow(tokens, 0.3)) AS z FROM per)
      SELECT source, n_docs, tokens,
             round(tokens / all_tokens, 6) AS share,
             round(pow(tokens, 0.3) / z, 6) AS weight,
             round((pow(tokens, 0.3) / z) / (tokens / all_tokens), 6) AS epochs
      FROM per CROSS JOIN tot ORDER BY source""")) { (s, dir) =>
      val per = Tables.dfSpread(s, dir, "documents")
        .select(col("source"), size(toks(col("text"))).cast("long").as("n"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("tokens"))
      val tot = per.agg(sum(col("tokens")).cast("double").as("all_tokens"),
        sum(pow(col("tokens"), lit(0.3))).as("z"))
      per.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("tokens"),
          round(col("tokens") / col("all_tokens"), 6).as("share"),
          round(pow(col("tokens"), lit(0.3)) / col("z"), 6).as("weight"),
          round((pow(col("tokens"), lit(0.3)) / col("z")) /
            (col("tokens") / col("all_tokens")), 6).as("epochs"))
        .orderBy(col("source"))
    }
  )
}
