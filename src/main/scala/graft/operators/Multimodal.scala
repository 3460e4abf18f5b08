package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata, and per-batch decode / feature
  * extraction runs as a partition-local stage.
  *
  * The decode kernels themselves are STUBBED (no image/audio libraries in
  * this environment) behind `DecodeStub` — deterministic fakes keyed off the
  * payload bytes — but everything Spark-side is real: the asset schema, the
  * mapPartitions batch shape (one decoder instance per partition, amortized
  * across rows, exactly how a JNI/FFmpeg/JPEG decoder would be held), the
  * partitioning knobs, and the output feature schema.
  */
object Multimodal {

  /** An opaque media payload + typed metadata. */
  case class MediaAsset(
      asset_id: Long,
      kind: String,          // image | audio | video
      payload: Array[Byte],  // opaque encoded bytes
      mime: String)

  /** Typed features out of the decode stage. */
  case class MediaFeatures(
      asset_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,            // stub: derived deterministically from bytes
      height: Int,
      duration_ms: Long,
      feature: Array[Float]) // stub embedding, unit-norm, dim 8

  /** Deterministic decode fakes. A real deployment swaps this object for a
    * JNI-backed decoder; the Spark plumbing around it does not change. */
  object DecodeStub {
    def dims(payload: Array[Byte]): (Int, Int) = {
      val h = java.util.Arrays.hashCode(payload)
      (64 + math.abs(h % 1024), 64 + math.abs((h / 1024) % 1024))
    }

    def durationMs(payload: Array[Byte]): Long =
      1000L + (math.abs(java.util.Arrays.hashCode(payload).toLong) % 60000L)

    /** Unit-norm 8-dim feature vector derived from payload bytes. */
    def embed(payload: Array[Byte]): Array[Float] = {
      val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
      val raw = (0 until 8).map(i =>
        ((md(2 * i) & 0xff) << 8 | (md(2 * i + 1) & 0xff)).toFloat - 32768f)
      val norm = math.sqrt(raw.map(x => x * x).sum).toFloat max 1e-9f
      raw.map(_ / norm).toArray
    }
  }

  /** Wrap any table with a binary payload into the asset schema. Used by
    * tests to fabricate assets from the documents table. */
  def assetsFromDocuments(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    graft.Tables.df(spark, dir, "documents")
      .select(col("doc_id").as("asset_id"),
        lit("image").as("kind"),
        col("text").cast("binary").as("payload"),
        lit("image/fake").as("mime"))
      .as[MediaAsset]
  }

  /** The decode/feature-extract stage: partition-local, one decoder per
    * partition, rows streamed through it. At scale this is a map-only stage —
    * no shuffle — and partition sizing is controlled upstream by
    * spark.sql.files.maxPartitionBytes. */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // (real code: open decoder handle here, once per partition)
      it.map { a =>
        val (w, h) = DecodeStub.dims(a.payload)
        MediaFeatures(
          asset_id = a.asset_id,
          kind = a.kind,
          n_bytes = a.payload.length.toLong,
          width = w,
          height = h,
          duration_ms = if (a.kind == "image") 0L else DecodeStub.durationMs(a.payload),
          feature = DecodeStub.embed(a.payload))
      }
      // (real code: close decoder handle via task-completion listener)
    }
  }

  /** Resize stage: binary→binary transform with target dims carried in the
    * row (decode+re-encode stubbed: the fake payload is a digest of source
    * bytes + target box, so downstream stages see distinct, deterministic
    * payloads). Partition-local map, same no-shuffle shape as extract. */
  def resize(assets: Dataset[MediaAsset], maxW: Int, maxH: Int): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val fake = java.security.MessageDigest.getInstance("MD5")
          .digest(a.payload ++ s":$maxW:$maxH".getBytes("UTF-8"))
        a.copy(payload = fake, mime = a.mime + s";resized=${maxW}x$maxH")
      }
    }
  }

  /** Frame-sampling shape for video: explode N sample offsets per asset —
    * the row-multiplying pattern a video pipeline uses, with the decode
    * itself stubbed. */
  def sampleFrames(assets: Dataset[MediaAsset], n: Int): DataFrame =
    assets.toDF()
      .withColumn("frame_idx", explode(sequence(lit(0), lit(n - 1))))
      .select(col("asset_id"), col("frame_idx"),
        md5(concat(col("payload").cast("string"), col("frame_idx").cast("string")))
          .as("frame_digest"))
}
