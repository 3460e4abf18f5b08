package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata, and per-batch decode / feature
  * extraction runs as a partition-local stage.
  *
  * IMAGE decode, resize, and feature extraction are REAL — pure-JDK
  * `javax.imageio` (PNG/JPEG/GIF/BMP) + `Graphics2D`, fully headless, no
  * external libraries. Payloads ImageIO cannot decode, and audio/video
  * (no codecs ship with the JDK), fall back to `DecodeStub` — deterministic
  * fakes keyed off the payload bytes — so the pipeline shape is total.
  * Everything Spark-side is identical either way: the asset schema, the
  * mapPartitions batch shape (one decoder instance per partition, amortized
  * across rows, exactly how a JNI/FFmpeg decoder would be held), the
  * partitioning knobs, and the output feature schema.
  */
object Multimodal {

  /** Pure-JDK image kernels (ImageIO + Graphics2D, headless-safe). */
  object ImageCodec {
    def decode(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case _: Throwable => None }

    /** Content-derived feature: average luminance over a 4x2 grid,
      * unit-normed — the cheap real analogue of a visual embedding (same
      * dim-8 contract as the stub). */
    def luminanceFeature(img: java.awt.image.BufferedImage): Array[Float] = {
      val (gw, gh) = (4, 2)
      val cells = new Array[Double](gw * gh)
      val counts = new Array[Long](gw * gh)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          val lum = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
            0.114 * (rgb & 0xff)
          val cell = math.min(gh - 1, y * gh / img.getHeight) * gw +
            math.min(gw - 1, x * gw / img.getWidth)
          cells(cell) += lum
          counts(cell) += 1
          x += 1
        }
        y += 1
      }
      val raw = cells.indices.map(i =>
        if (counts(i) == 0) 0f else (cells(i) / counts(i)).toFloat).toArray
      val norm = math.sqrt(raw.map(x => x.toDouble * x).sum).toFloat max 1e-9f
      raw.map(_ / norm)
    }

    /** Aspect-preserving downscale into a maxW x maxH box, re-encoded PNG.
      * Never upscales. */
    def resizePng(img: java.awt.image.BufferedImage, maxW: Int, maxH: Int): Array[Byte] = {
      val scale = math.min(1.0,
        math.min(maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight))
      val (w, h) = (math.max(1, (img.getWidth * scale).round.toInt),
        math.max(1, (img.getHeight * scale).round.toInt))
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }

    /** 64-bit average hash (aHash): mean luminance per cell of an 8x8 grid,
      * bit i set when cell i is brighter than the grid mean. Cell averages
      * are computed directly (no Graphics2D resampling), so the hash is a
      * pure arithmetic function of the pixels — deterministic across JVMs —
      * and resolution-independent for content whose structure is coarser
      * than the grid (the property perceptual dedup relies on: the same
      * image at 64px and 128px hashes identically, a different image
      * differs in ~half the bits). */
    def averageHash(img: java.awt.image.BufferedImage): Long = {
      val cells = new Array[Double](64)
      val counts = new Array[Long](64)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          val lum = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
            0.114 * (rgb & 0xff)
          val cell = math.min(7, y * 8 / img.getHeight) * 8 +
            math.min(7, x * 8 / img.getWidth)
          cells(cell) += lum
          counts(cell) += 1
          x += 1
        }
        y += 1
      }
      val avgs = cells.indices.map(i => if (counts(i) == 0) 0.0 else cells(i) / counts(i))
      val mean = avgs.sum / 64.0
      avgs.zipWithIndex.foldLeft(0L) { case (h, (a, i)) =>
        if (a > mean) h | (1L << i) else h
      }
    }

    /** Deterministic SCALE-INVARIANT PNG: an 8x8 block pattern whose
      * on/off cells are the bits of md5(seed), rendered at any resolution
      * divisible by 8. The same seed at different sizes is pixel-different
      * but perceptually identical — the fixture class aHash dedup exists
      * to catch. */
    def syntheticBlockPng(size: Int, seed: Int): Array[Byte] = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"block:$seed".getBytes("UTF-8"))
      val img = new java.awt.image.BufferedImage(size, size,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < size) {
        var x = 0
        while (x < size) {
          val cell = (y * 8 / size) * 8 + (x * 8 / size)
          val on = (md(cell / 8) >> (cell % 8) & 1) == 1
          img.setRGB(x, y, if (on) 0xffffff else 0x000000)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Deterministic PNG generator (test fixture support). */
    def syntheticPng(w: Int, h: Int, seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, (x * 31 + y * 17 + seed) & 0xffffff)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

  /** Synthetic-PCM audio path — the audio sibling of [[ImageCodec]]: the
    * container has no audio decoders, so the SIGNAL is synthesized
    * deterministically (the decode stub), while everything downstream —
    * framing, energy contour, landmark peaks, fingerprint hashing, the
    * Spark partition pipeline — is the real Shazam-style machinery a
    * deployment would run on decoded PCM.
    */
  object AudioCodec {

    /** Deterministic 16-bit mono PCM: three md5(seed)-derived sinusoids
      * plus a seeded integer dither. The signal is a pure function of
      * (seed, sample index), so the same seed produces the same PREFIX at
      * any duration — duration variants of one recording agree on every
      * frame they share. StrictMath keeps the waveform bit-identical
      * across JVMs/executors. */
    def syntheticPcm(nSamples: Int, seed: Int): Array[Short] = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"audio:$seed".getBytes("UTF-8"))
      val freqs = (0 until 3).map(k => 2.0 + (md(k) & 0x3f))
      val amps = (0 until 3).map(k => 2000.0 + ((md(k + 3) & 0x7f) << 5))
      // seed-derived amplitude envelope (2..9 beats per 32 frames, seeded
      // phase): a stationary sinusoid mix has a near-FLAT energy contour
      // (frame energy ≈ Σ A²/2 regardless of phase), which starves the
      // landmark stage — the beats put seed-distinctive peaks in it
      val beat = 2.0 + (md(6) & 0x7)
      val beat2 = 10.0 + (md(8) & 0xf)
      val phase = (md(7) & 0xff) / 256.0 * 2.0 * StrictMath.PI
      val phase2 = (md(9) & 0xff) / 256.0 * 2.0 * StrictMath.PI
      Array.tabulate(nSamples) { i =>
        val env = 1.0 +
          0.7 * StrictMath.sin(2.0 * StrictMath.PI * beat * i / 8192.0 + phase) +
          0.25 * StrictMath.sin(2.0 * StrictMath.PI * beat2 * i / 8192.0 + phase2)
        val s = (0 until 3).map(k =>
          amps(k) * StrictMath.sin(2.0 * StrictMath.PI * freqs(k) * i / 1024.0)).sum
        val dither = ((i * 2654435761L + seed * 40503L) >>> 52).toInt - 2048
        math.max(math.min(env * s + dither, 32767.0), -32768.0).toShort
      }
    }

    /** Mean-square energy of consecutive `frame`-sample windows. */
    def frameEnergies(pcm: Array[Short], frame: Int = 256): Array[Double] =
      Array.tabulate(pcm.length / frame) { f =>
        var i = f * frame
        var acc = 0.0
        while (i < (f + 1) * frame) { acc += pcm(i).toDouble * pcm(i); i += 1 }
        acc / frame
      }

    /** Landmark frames: strict local maxima of the energy contour. */
    def landmarks(e: Array[Double]): Seq[Int] =
      (1 until e.length - 1).filter(i => e(i) > e(i - 1) && e(i) > e(i + 1))

    /** Constellation fingerprint over the DURATION-INVARIANT prefix: the
      * first 8 landmark (anchor, delta, energy-bucket) triples within the
      * first 32 frames, hash-combined. Clips that share a signal prefix —
      * re-encodes, truncations, padded variants — collide; different
      * signals don't. */
    def fingerprint(pcm: Array[Short]): Long = {
      val e = frameEnergies(pcm).take(32)
      val lm = landmarks(e).take(8)
      // fold landmark COUNT and first anchor into the seed so contours
      // with <2 landmarks don't all collapse onto the bare initial hash
      lm.zip(lm.drop(1)).foldLeft(17L + lm.length * 7919L +
        lm.headOption.getOrElse(-1) * 104729L) { case (h, (a, b)) =>
        val bucket = (StrictMath.log1p(e(a)) * 16).toLong
        h * 1000003L + a * 131L + (b - a) * 31L + bucket
      }
    }
  }

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
    graft.Tables.dfSpread(spark, dir, "documents")
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
      // decoder state is partition-local (ImageIO caches readers per thread;
      // a JNI decoder handle would be opened here once per partition)
      it.map { a =>
        val real = if (a.kind == "image") ImageCodec.decode(a.payload) else None
        real match {
          case Some(img) =>
            MediaFeatures(a.asset_id, a.kind, a.payload.length.toLong,
              img.getWidth, img.getHeight, 0L, ImageCodec.luminanceFeature(img))
          case None =>
            // non-image kinds and undecodable payloads: deterministic stub
            val (w, h) = DecodeStub.dims(a.payload)
            MediaFeatures(a.asset_id, a.kind, a.payload.length.toLong, w, h,
              if (a.kind == "image") 0L else DecodeStub.durationMs(a.payload),
              DecodeStub.embed(a.payload))
        }
      }
    }
  }

  /** Resize stage: binary→binary transform with target dims carried in the
    * row. Decodable images get a REAL aspect-preserving bilinear downscale
    * re-encoded as PNG (pure JDK); undecodable payloads get the
    * deterministic digest stub so the stage stays total. Partition-local
    * map, same no-shuffle shape as extract. */
  def resize(assets: Dataset[MediaAsset], maxW: Int, maxH: Int): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        ImageCodec.decode(a.payload) match {
          case Some(img) =>
            a.copy(payload = ImageCodec.resizePng(img, maxW, maxH),
              mime = s"image/png;resized=${maxW}x$maxH")
          case None =>
            val fake = java.security.MessageDigest.getInstance("MD5")
              .digest(a.payload ++ s":$maxW:$maxH".getBytes("UTF-8"))
            a.copy(payload = fake, mime = a.mime + s";resized=${maxW}x$maxH")
        }
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
