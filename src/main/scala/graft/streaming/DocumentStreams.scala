package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming twins of the document-pipeline operators (SURVEY.md §2.6 is a
  * new capability — the reference has no streaming): the incremental form
  * of a training-data ingest. At 100 TB this is how the corpus actually
  * arrives — a continuous drop of files — and the batch plans in
  * PipelineQueries apply unchanged to each micro-batch because every stage
  * here is row-local except the dedup state (keyed by content digest) and
  * the per-language aggregate.
  */
object DocumentStreams {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def readDocumentStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Row-local quality gate + content fingerprint — the streaming form of
    * p09 (quality) + p01's digest stage. Map-only: survives any scale. */
  def cleanAndFingerprint(docs: DataFrame): DataFrame =
    docs
      .withColumn("digest", md5(col("text")))
      .withColumn("n_tokens", size(split(col("text"), "\\s+")))
      .filter(col("n_tokens") >= 3 && length(trim(col("text"))) > 0)

  /** Exact content dedup — the streaming form of p01. State is keyed by
    * digest; in production you bound it with a watermark on ingest time
    * (documents carry none here, so state grows with unique content — the
    * same contract as batch distinct). */
  def dedupByContent(docs: DataFrame): DataFrame =
    cleanAndFingerprint(docs).dropDuplicates("digest")

  /** Incremental per-language corpus stats — the streaming form of p16's
    * summary aggregate. Partial aggregation per micro-batch, merged into
    * the state store exactly like a batch partial+final hash agg. */
  def langStats(docs: DataFrame): DataFrame =
    cleanAndFingerprint(docs)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        approx_count_distinct(col("digest")).as("approx_unique"))
}
