package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

/** The salted hot-key join must produce the exact multiset of the plain
  * join on deliberately skewed data, the hot-key detector must isolate
  * exactly the keys above the threshold, and the salt assignment must
  * actually spread a hot key's distinct rows across replicas (otherwise the
  * utility silently degenerates to the plain skewed join it exists to fix). */
class SkewJoinSpec extends AnyFunSuite {
  private val spark = SharedSpark.spark
  import spark.implicits._

  // 1 hot key (id=7, 5000 rows) + 200 cold keys x 10 rows; dim covers all
  // keys plus some unmatched ones.
  private lazy val probe = spark.range(0, 5000).select(
      lit(7L).as("k"), (col("id") * 3).as("payload"))
    .unionByName(spark.range(0, 2000).select(
      (col("id") % 200 + 100).as("k"), col("id").as("payload")))
  private lazy val build = spark.range(0, 400).select(
    col("id").as("k"), concat(lit("dim"), col("id")).as("attr"))

  test("salted join equals plain join (multiset)") {
    val salted = SkewJoin.skewAwareJoin(probe, build, Seq("k"), hotThreshold = 1000L, saltFactor = 8)
      .groupBy(col("k"), col("payload"), col("attr")).agg(count(lit(1)).as("n"))
    val plain = probe.join(build, Seq("k"))
      .groupBy(col("k"), col("payload"), col("attr")).agg(count(lit(1)).as("n"))
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    assert(salted.agg(sum(col("n"))).head.getLong(0) ===
      plain.agg(sum(col("n"))).head.getLong(0))
  }

  test("hot-key detection finds exactly the keys over the threshold") {
    val hot = SkewJoin.hotKeys(probe, Seq("k"), 1000L).collect()
    assert(hot.map(_.getLong(0)).toSeq == Seq(7L))
    assert(hot.head.getLong(1) == 5000L)
    // Nothing hot under a higher threshold; everything hot under 1.
    assert(SkewJoin.hotKeys(probe, Seq("k"), 10000L).isEmpty)
    assert(SkewJoin.hotKeys(probe, Seq("k"), 1L).count() == 201L)
  }

  test("hot rows spread across salt replicas") {
    // Reconstruct the utility's salt expression over the hot key's rows:
    // distinct payloads must land in >1 bucket for salting to have split
    // the hot group at all.
    val saltFactor = 8
    val buckets = probe.filter(col("k") === 7L)
      .select(pmod(xxhash64(probe.columns.map(col): _*), lit(saltFactor.toLong)).as("salt"))
      .groupBy(col("salt")).agg(count(lit(1)).as("n"))
    val counts = buckets.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(counts.size == saltFactor, s"expected all $saltFactor salt buckets used, got ${counts.keys}")
    // No bucket owns more than half the hot rows — the split is real.
    assert(counts.values.max <= 2500, s"lopsided salt distribution: $counts")
  }

  test("no hot keys degrades gracefully to the plain join") {
    val salted = SkewJoin.skewAwareJoin(probe, build, Seq("k"), hotThreshold = 100000L)
    assert(salted.count() == probe.join(build, Seq("k")).count())
  }

  test("fraction threshold isolates the hot key and matches the plain join") {
    // id=7 owns 5000/7000 rows (~71%); every cold key owns ~0.14% — a 10%
    // fraction threshold salts exactly the hot key at ANY data scale,
    // which an absolute row threshold cannot promise.
    val salted = SkewJoin.skewAwareJoinByFraction(
        probe, build, Seq("k"), hotFraction = 0.1, saltFactor = 8)
      .groupBy(col("k"), col("payload"), col("attr")).agg(count(lit(1)).as("n"))
    val plain = probe.join(build, Seq("k"))
      .groupBy(col("k"), col("payload"), col("attr")).agg(count(lit(1)).as("n"))
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("rand-based salting (deterministic=false) keeps the multiset") {
    val salted = SkewJoin.skewAwareJoin(probe, build, Seq("k"),
        hotThreshold = 1000L, saltFactor = 8, deterministic = false)
      .groupBy(col("k"), col("payload"), col("attr")).agg(count(lit(1)).as("n"))
    val plain = probe.join(build, Seq("k"))
      .groupBy(col("k"), col("payload"), col("attr")).agg(count(lit(1)).as("n"))
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("rand-based salting spreads exact duplicate rows of a hot key") {
    // 4000 IDENTICAL rows of one key: the whole-row hash necessarily puts
    // them on one replica (documented degenerate case); rand() spreads them.
    val dupProbe = spark.range(0, 4000).select(lit(7L).as("k"), lit(1L).as("payload"))
    val tinyBuild = spark.range(0, 1).select(lit(7L).as("k"), lit("d").as("attr"))
    val out = SkewJoin.skewAwareJoin(dupProbe, tinyBuild, Seq("k"),
      hotThreshold = 100L, saltFactor = 8, deterministic = false)
    assert(out.count() == 4000L)
  }
}
