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

  test("Graft.stream yields rows incrementally") {
    val g = Graft(spark)
    g.registerDir(SharedSpark.sf)
    val it = g.stream("SELECT n_nationkey FROM nation ORDER BY n_nationkey")
    assert(it.take(3).map(_.getInt(0)).toSeq == Seq(0, 1, 2))
  }
}
