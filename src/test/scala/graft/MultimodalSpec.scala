package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  test("binary asset plumbing: schema, decode stage, feature shape") {
    val assets = Multimodal.assetsFromDocuments(spark, SharedSpark.sf)
    val feats = Multimodal.extractFeatures(assets)
    val rows = feats.limit(20).collect()
    assert(rows.nonEmpty)
    rows.foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.width >= 64 && f.height >= 64)
      assert(f.feature.length == 8)
      val norm = math.sqrt(f.feature.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-3, s"feature not unit-norm: $norm")
    }
  }

  test("decode stub is deterministic") {
    val b = "payload-bytes".getBytes
    assert(Multimodal.DecodeStub.dims(b) == Multimodal.DecodeStub.dims(b.clone()))
    assert(Multimodal.DecodeStub.embed(b).sameElements(Multimodal.DecodeStub.embed(b.clone())))
  }

  test("frame sampling explodes n rows per asset") {
    val assets = Multimodal.assetsFromDocuments(spark, SharedSpark.sf).limit(5)
    val frames = Multimodal.sampleFrames(assets, 4)
    assert(frames.count() == 20)
    assert(frames.select(countDistinct(col("frame_digest"))).head().getLong(0) == 20)
  }

  test("resize stage rewrites payloads deterministically, keeps ids") {
    val assets = Multimodal.assetsFromDocuments(spark, SharedSpark.sf).limit(10)
    val resized = Multimodal.resize(assets, 256, 256)
    val orig = assets.collect().map(a => a.asset_id -> a.payload.toSeq).toMap
    val out = resized.collect()
    assert(out.length == 10)
    out.foreach { a =>
      assert(a.mime.endsWith("resized=256x256"))
      assert(a.payload.toSeq != orig(a.asset_id), "payload must change")
    }
    // deterministic: same input + box → same bytes
    val again = Multimodal.resize(assets, 256, 256).collect()
      .map(a => a.asset_id -> a.payload.toSeq).toMap
    out.foreach(a => assert(a.payload.toSeq == again(a.asset_id)))
  }

  test("real image decode: ImageIO dims + content-derived luminance features") {
    import spark.implicits._
    val a = Multimodal.MediaAsset(1L, "image",
      Multimodal.ImageCodec.syntheticPng(100, 40, seed = 7), "image/png")
    val b = Multimodal.MediaAsset(2L, "image",
      Multimodal.ImageCodec.syntheticPng(64, 64, seed = 9), "image/png")
    val feats = Multimodal.extractFeatures(Seq(a, b).toDS()).collect().sortBy(_.asset_id)
    assert(feats(0).width == 100 && feats(0).height == 40, "real decoded dims")
    assert(feats(1).width == 64 && feats(1).height == 64)
    feats.foreach { f =>
      val norm = math.sqrt(f.feature.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-3)
    }
    assert(!feats(0).feature.sameElements(feats(1).feature),
      "features must derive from pixel content")
  }

  test("real image resize: aspect-preserving downscale, decodable output, no upscale") {
    import spark.implicits._
    val png = Multimodal.ImageCodec.syntheticPng(200, 100, seed = 3)
    val down = Multimodal.resize(
      Seq(Multimodal.MediaAsset(1L, "image", png, "image/png")).toDS(), 64, 64)
      .collect()(0)
    val img = Multimodal.ImageCodec.decode(down.payload)
      .getOrElse(fail("resized payload must be a decodable PNG"))
    assert(img.getWidth == 64 && img.getHeight == 32, "aspect-preserving box fit")
    assert(down.mime == "image/png;resized=64x64")
    val same = Multimodal.resize(
      Seq(Multimodal.MediaAsset(2L, "image", png, "image/png")).toDS(), 500, 500)
      .collect()(0)
    val img2 = Multimodal.ImageCodec.decode(same.payload).get
    assert(img2.getWidth == 200 && img2.getHeight == 100, "never upscales")
  }

  test("averageHash: resolution-invariant for block content, discriminative across seeds") {
    import graft.operators.Multimodal.ImageCodec
    def hashAt(size: Int, seed: Int): Long =
      ImageCodec.averageHash(ImageCodec.decode(ImageCodec.syntheticBlockPng(size, seed)).get)
    // same seed at all three p33 resolutions → identical 64-bit hash
    for (seed <- Seq(0, 7, 39)) {
      val hs = Seq(64, 96, 128).map(hashAt(_, seed))
      assert(hs.distinct.size == 1, s"seed $seed must hash identically at all sizes, got $hs")
    }
    // different seeds → different hashes (40 distinct fixtures, 0 collisions)
    val all = (0 until 40).map(hashAt(64, _))
    assert(all.distinct.size == 40, "the 40 p33 seeds must yield 40 distinct hashes")
  }

  test("p33: perceptual clusters pair pixel-different renditions of the same seed") {
    val out = SparkEntry.queries("p33_image_phash_dedup")(spark, SharedSpark.sf).collect()
    assert(out.nonEmpty, "gate corpus must contain perceptual duplicates")
    // every cluster spans multiple resolutions — the case byte dedup misses
    assert(out.forall(_.getAs[Long]("n_sizes") >= 2))
    // clusters are keyed by seed = doc_id % 40: representative is the seed
    assert(out.forall(r => r.getAs[Long]("rep_id") % 40 == r.getAs[Long]("rep_id")))
  }

  test("Graft.stream yields rows incrementally") {
    val g = Graft(spark)
    g.registerDir(SharedSpark.sf)
    val it = g.stream("SELECT n_nationkey FROM nation ORDER BY n_nationkey")
    assert(it.take(3).map(_.getInt(0)).toSeq == Seq(0, 1, 2))
  }
}
