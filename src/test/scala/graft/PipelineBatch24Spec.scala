package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the batch-24 operator beyond the driver gate: frame
  * accounting through the video sampling plumbing.
  */
class PipelineBatch24Spec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def byName(n: String) = SparkEntry.allDefs.find(_.name == n).get

  test("p100: frame families account for every sampled frame, keyed by seed class") {
    val rows = byName("p100_video_frame_dedup").run(spark, SharedSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val corpusN = Tables.df(spark, SharedSpark.sf, "documents").count()
    val seedClasses = math.min(25L, corpusN)
    assert(rows.length == seedClasses * 4,
      "expected 4 frame families per seed class")
    assert(rows.map(_._3).sum == corpusN * 4,
      "frame copies do not account for every sampled frame")
    // each keeper is the smallest doc in its seed class and owns exactly 4 families
    val byKeeper = rows.groupBy(_._2)
    byKeeper.foreach { case (k, fams) =>
      assert(fams.length == 4, s"keeper $k owns ${fams.length} frame families")
      assert(k < 25 || corpusN <= k, s"keeper $k is not a seed-class minimum")
      // all members of one seed class share a copy count
      assert(fams.map(_._3).distinct.length == 1, s"keeper $k: uneven family sizes")
    }
    assert(rows.map(_._1).distinct.length == rows.length, "colliding frame digests")
  }
}
