package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.ExactPercentile

/** The bounded-state exact percentile must agree with Spark's group-buffering
  * `percentile` (the semantics it replaces) on every path: one-level
  * histogram, two-phase bucketed refine, and the melted multi-measure form —
  * including duplicate values, exact-integer rank positions, and groups of
  * one.
  */
class ExactPercentileSpec extends AnyFunSuite {
  private val spark = SharedSpark.spark
  import spark.implicits._

  // Deterministic pseudo-random values: three groups of co-prime sizes so
  // rank positions hit integers, .5 fractions, and awkward fractions; many
  // duplicated values via the modulus.
  private lazy val data = (1 to 997).map { i =>
    val g = i % 3
    val v = ((i * 7919) % 251).toDouble + g // overlapping but shifted domains
    (s"g$g", v)
  }.toDF("k", "v")

  private def sparkPercentile(p: Double): Map[String, Double] =
    data.groupBy($"k").agg(expr(s"percentile(v, $p)").as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  private def assertAgree(got: Map[String, Double], p: Double): Unit = {
    val want = sparkPercentile(p)
    assert(got.keySet == want.keySet)
    for ((k, w) <- want)
      assert(math.abs(got(k) - w) < 1e-9, s"$k at p=$p: got ${got(k)}, want $w")
  }

  test("one-level histogram matches Spark percentile (several fractions at once)") {
    val ps = Seq(0.0 -> "p0", 0.25 -> "p25", 0.5 -> "p50", 0.9 -> "p90", 1.0 -> "p100")
    val out = ExactPercentile.percentiles(data, "k", $"v", ps).collect()
      .map(r => r.getString(0) -> r).toMap
    for (((p, name), idx) <- ps.zipWithIndex)
      assertAgree(out.map { case (k, r) => k -> r.getDouble(idx + 1) }, p)
  }

  test("two-phase refine matches Spark percentile across bucket widths") {
    for (width <- Seq(1.0, 10.0, 1000.0); p <- Seq(0.1, 0.5, 0.95)) {
      val got = ExactPercentile.refined(
        data, "k", $"v", Seq(p -> "r"), v => floor(v / width))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assertAgree(got, p)
    }
  }

  test("melted multi-measure refinedDynamic: two measures, one pass") {
    val prepared = data
      .select($"k", explode(array(
        struct(lit("a").as("__m"), $"v".as("__v")),
        struct(lit("b").as("__m"), ($"v" * 13 + 1).as("__v")))).as("e"))
      .select($"k", $"e.__m".as("__m"), $"e.__v".as("__v"))
      .withColumn("__b", floor($"__v" / 10).cast("long"))
      .withColumn("__p", when($"__m" === "a", 0.5).otherwise(0.9))
    val out = ExactPercentile.refinedDynamic(prepared, Seq("k", "__m")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assertAgree(out.collect { case ((k, "a"), v) => k -> v }, 0.5)
    val wantB = data.select($"k", ($"v" * 13 + 1).as("v")).groupBy($"k")
      .agg(expr("percentile(v, 0.9)").as("r")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    for ((k, w) <- wantB)
      assert(math.abs(out((k, "b")) - w) < 1e-9)
  }

  test("fromHistogram extraAggs re-combine per-(key,value) partials") {
    val hist = data.groupBy($"k", $"v".cast("double").as("__v"))
      .agg(count(lit(1)).as("__c"), max($"v").as("__mx"))
    val out = ExactPercentile.fromHistogram(
      hist, "k", Seq(0.5 -> "med"), extraAggs = Seq(max($"__mx").as("mx")))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val wantMx = data.groupBy($"k").agg(max($"v")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out.nonEmpty)
    for ((k, _, mx) <- out) assert(mx == wantMx(k))
    assertAgree(out.map(t => t._1 -> t._2).toMap, 0.5)
  }

  test("groups of one and all-duplicate groups") {
    val tiny = Seq(("a", 42.0), ("b", 7.0), ("b", 7.0), ("b", 7.0)).toDF("k", "v")
    for (p <- Seq(0.0, 0.37, 1.0)) {
      val got = ExactPercentile.percentiles(tiny, "k", $"v", Seq(p -> "r"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == Map("a" -> 42.0, "b" -> 7.0))
      val ref = ExactPercentile.refined(tiny, "k", $"v", Seq(p -> "r"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(ref == Map("a" -> 42.0, "b" -> 7.0))
    }
  }

  test("null values are ignored; an all-null group yields no row (percentile semantics)") {
    val withNulls = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)), ("z", None))
      .toDF("k", "v")
    val got = ExactPercentile.percentiles(withNulls, "k", $"v", Seq(0.5 -> "r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("a" -> 2.0))
  }

  test("high-cardinality domain: two-phase shuffle stays bucket-bounded (decision rule)") {
    // Every value distinct — the domain where the one-level histogram
    // degenerates to a data-sized shuffle and the scaladoc decision rule
    // says: use `refined`.
    val hiCard = (1 to 5000).map(i => (s"g${i % 2}", i * 1.0001)).toDF("k", "v")
    val width = 500.0
    // Phase-A state for `refined` is one row per (key, bucket) — assert the
    // bucket domain is orders of magnitude under the value domain, so the
    // only data-sized stage is the map-side partial aggregation.
    val nValues = hiCard.select($"k", $"v").distinct().count()
    val nBuckets = hiCard.select($"k", floor($"v" / width)).distinct().count()
    assert(nValues == 5000L)
    assert(nBuckets <= 26L, s"bucket domain must stay tiny, got $nBuckets")
    // And the two-phase result is still exact.
    val want = hiCard.groupBy($"k").agg(expr("percentile(v, 0.9)").as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = ExactPercentile.refined(hiCard, "k", $"v", Seq(0.9 -> "r"),
        v => floor(v / width))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == want.keySet)
    for ((k, w) <- want) assert(math.abs(got(k) - w) < 1e-9)
  }

  test("fromHistogram rejects an empty selection with a clear message") {
    val hist = Seq(("a", 1.0, 3L)).toDF("k", "__v", "__c")
    val e = intercept[IllegalArgumentException] {
      ExactPercentile.fromHistogram(hist, "k", Nil)
    }
    assert(e.getMessage.contains("at least one percentile fraction"))
    // extraAggs alone is a legal selection (the q41 re-reduce shape)
    val out = ExactPercentile.fromHistogram(hist, "k", Nil, Seq(sum($"__c").as("n")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 3L))
  }

  test("probe frames carrying service-column names do not bind ambiguously") {
    // A caller-prepared frame that already has __below/__n/__p columns (the
    // round-6 ADVICE hazard): target-side service columns are __t_-prefixed,
    // so the join must neither throw nor bind the wrong column.
    val prepared = data
      .select($"k", $"v".as("__v"))
      .withColumn("__b", floor($"__v" / 10).cast("long"))
      .withColumn("__p", lit(0.5))
      .withColumn("__below", lit(-1L)) // poison: wrong values if ever read
      .withColumn("__n", lit(-1L))
    val got = ExactPercentile.refinedDynamic(prepared, Seq("k"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assertAgree(got, 0.5)
  }
}
