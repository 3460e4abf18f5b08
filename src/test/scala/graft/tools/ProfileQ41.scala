package graft.tools
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.ExactPercentile

// scratch profiling harness — not part of the library surface
object ProfileQ41 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def sink(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    val li = Tables.df(spark, dir, "lineitem")
    time("qty_hist_only")(sink(li.groupBy(col("l_returnflag"), col("l_quantity").cast("double").as("__v")).agg(count(lit(1)).as("__c"))))
    time("price_hist_only")(sink(li.groupBy(col("l_returnflag"), col("l_extendedprice").cast("double").as("__v")).agg(count(lit(1)).as("__c"))))
    time("med_qty_full")(sink(ExactPercentile.percentiles(li, "l_returnflag", col("l_quantity"), Seq(0.5 -> "m"))))
    time("p90_refined")(sink(ExactPercentile.refined(li, "l_returnflag", col("l_extendedprice"), Seq(0.9 -> "m"))))
    time("coarse_only")(sink(li.groupBy(col("l_returnflag"), floor(col("l_extendedprice").cast("double") / 100.0).cast("long")).agg(count(lit(1)))))
    time("scan_only")(sink(li.select(col("l_returnflag"), col("l_extendedprice"))))
    time("q41_now")(sink(graft.SparkEntry.queries("q41_agg_extra")(spark, dir)))
    spark.stop()
  }
}
// appended scratch: construction-vs-sink split for the checkpointed q41
object ProfileQ41b {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def sink(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries("q41_agg_extra")(spark, dir)
      val t1 = System.nanoTime()
      sink(df)
      val t2 = System.nanoTime()
      println(f"PROFILEB construct ${(t1 - t0) / 1e9}%.3f sink ${(t2 - t1) / 1e9}%.3f")
    }
    spark.stop()
  }
}
// appended scratch: candidate restructurings for q41 (round 6)
object ProfileQ41c {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.expressions.Window
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def sink(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILEC $name ${times.min}%.3f s (trials ${times.map(t => f"$t%.2f").mkString(",")})")
    }
    val li = Tables.df(spark, dir, "lineitem")

    // V2: phase A with int keys via union-of-branches (no explode, no strings)
    def phaseAUnion(): DataFrame = {
      val b0 = li.select(
        ascii(col("l_returnflag")).as("__k"),
        lit(0).as("__m"),
        col("l_quantity").cast("double").as("__v"),
        (col("l_quantity") >= 1).as("__qa"),
        (col("l_discount") > 0.09).as("__qo"),
        ascii(col("l_linestatus")).as("__ls"))
        .withColumn("__b", floor(col("__v")).cast("long"))
      val b1 = li.select(
        ascii(col("l_returnflag")).as("__k"),
        lit(1).as("__m"),
        col("l_extendedprice").cast("double").as("__v"),
        lit(null).cast("boolean").as("__qa"),
        lit(null).cast("boolean").as("__qo"),
        lit(null).cast("int").as("__ls"))
        .withColumn("__b", floor(col("__v") / 100.0).cast("long"))
      b0.unionAll(b1)
        .groupBy(col("__k"), col("__m"), col("__b"))
        .agg(count(lit(1)).as("__c"),
          min(col("__v")).as("__lo"), max(col("__v")).as("__hi"),
          expr("bool_and(__qa)").as("__ba"), expr("bool_or(__qo)").as("__bo"),
          min(col("__ls")).as("__mn"))
    }
    time("phaseA_union")(sink(phaseAUnion()))

    // V2b: phase A melted like today but int keys
    def phaseAMeltInt(): DataFrame = {
      val prepared = li
        .select(ascii(col("l_returnflag")).as("__k"),
          (col("l_quantity") >= 1).as("__qa"),
          (col("l_discount") > 0.09).as("__qo"),
          ascii(col("l_linestatus")).as("__ls"),
          explode(array(
            struct(lit(0).as("__m"), col("l_quantity").cast("double").as("__v")),
            struct(lit(1).as("__m"), col("l_extendedprice").cast("double").as("__v")))).as("__e"))
        .select(col("__k"), col("__e.__m").as("__m"), col("__e.__v").as("__v"),
          col("__qa"), col("__qo"), col("__ls"))
        .withColumn("__b",
          when(col("__m") === 0, floor(col("__v"))).otherwise(floor(col("__v") / 100.0)).cast("long"))
      val isQ = col("__m") === 0
      prepared
        .groupBy(col("__k"), col("__m"), col("__b"))
        .agg(count(lit(1)).as("__c"),
          min(col("__v")).as("__lo"), max(col("__v")).as("__hi"),
          expr("bool_and(CASE WHEN __m = 0 THEN __qa END)").as("__ba"),
          expr("bool_or(CASE WHEN __m = 0 THEN __qo END)").as("__bo"),
          min(when(isQ, col("__ls"))).as("__mn"))
    }
    time("phaseA_melt_int")(sink(phaseAMeltInt()))

    // phase B shape: filtered narrow rescan (simulate with fixed target buckets)
    def phaseBScan(): DataFrame = {
      import spark.implicits._
      val targets = Seq((65, 1, 360L), (78, 1, 360L), (82, 1, 361L)).toDF("__k", "__m", "__b")
      li.select(ascii(col("l_returnflag")).as("__k"),
          col("l_extendedprice").cast("double").as("__v"))
        .withColumn("__m", lit(1))
        .withColumn("__b", floor(col("__v") / 100.0).cast("long"))
        .join(broadcast(targets), Seq("__k", "__m", "__b"))
        .groupBy(col("__k"))
        .agg(sort_array(collect_list(col("__v"))).as("__vs"))
    }
    time("phaseB_price_scan")(sink(phaseBScan()))
    spark.stop()
  }
}
// appended scratch: fully assembled int-key q41 candidate
object ProfileQ41d {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.expressions.Window
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def sink(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    val li = Tables.df(spark, dir, "lineitem")

    def q41new(): DataFrame = {
      val isQ = col("__m") === 0
      val preparedA = li
        .select(ascii(col("l_returnflag")).as("__k"),
          (col("l_quantity") >= 1).as("__qa"),
          (col("l_discount") > 0.09).as("__qo"),
          ascii(col("l_linestatus")).as("__ls"),
          explode(array(
            struct(lit(0).as("__m"), col("l_quantity").cast("double").as("__v")),
            struct(lit(1).as("__m"), col("l_extendedprice").cast("double").as("__v")))).as("__e"))
        .select(col("__k"), col("__e.__m").as("__m"), col("__e.__v").as("__v"),
          col("__qa"), col("__qo"), col("__ls"))
        .withColumn("__b",
          when(isQ, floor(col("__v"))).otherwise(floor(col("__v") / 100.0)).cast("long"))
      val coarse = preparedA
        .groupBy(col("__k"), col("__m"), col("__b"))
        .agg(count(lit(1)).as("__c"),
          expr("bool_and(CASE WHEN __m = 0 THEN __qa END)").as("__ba"),
          expr("bool_or(CASE WHEN __m = 0 THEN __qo END)").as("__bo"),
          min(when(isQ, col("__ls"))).as("__mn"))
        .withColumn("__p", when(isQ, lit(0.5)).otherwise(lit(0.9)))
        .localCheckpoint()
      val base = coarse
        .groupBy(col("__k"))
        .agg(expr("bool_and(__ba)").as("all_pos"),
          expr("bool_or(__bo)").as("any_big_disc"),
          expr("char(min(__mn))").as("one_status"))
      val preparedB = li
        .select(ascii(col("l_returnflag")).as("__k"),
          explode(array(
            struct(lit(0).as("__m"), col("l_quantity").cast("double").as("__v")),
            struct(lit(1).as("__m"), col("l_extendedprice").cast("double").as("__v")))).as("__e"))
        .select(col("__k"), col("__e.__m").as("__m"), col("__e.__v").as("__v"))
        .withColumn("__b",
          when(col("__m") === 0, floor(col("__v"))).otherwise(floor(col("__v") / 100.0)).cast("long"))
      val percs = ExactPercentile
        .refinedFromCoarse(coarse, preparedB, Seq("__k", "__m"))
        .groupBy(col("__k"))
        .agg(
          max(when(isQ, col("res"))).as("med_raw"),
          max(when(col("__m") === 1, col("res"))).as("p90_raw"))
      base
        .join(broadcast(percs), Seq("__k"), "left")
        .select(
          expr("char(__k)").as("l_returnflag"),
          round(col("med_raw"), 4).as("med_qty"),
          round(col("p90_raw"), 4).as("p90_price"),
          col("all_pos"), col("any_big_disc"), col("one_status"))
        .orderBy(col("l_returnflag"))
    }
    // bench-like: construction + execution per trial
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      sink(q41new())
      println(f"PROFILED q41_new_total ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    q41new().show(10, false)
    spark.stop()
  }
}
// appended scratch: phase split of the int-key candidate
object ProfileQ41e {
  import org.apache.spark.sql.DataFrame
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def sink(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    val li = Tables.df(spark, dir, "lineitem")
    val isQ = col("__m") === 0
    def mkCoarse(): DataFrame = li
      .select(ascii(col("l_returnflag")).as("__k"),
        (col("l_quantity") >= 1).as("__qa"),
        (col("l_discount") > 0.09).as("__qo"),
        ascii(col("l_linestatus")).as("__ls"),
        explode(array(
          struct(lit(0).as("__m"), col("l_quantity").cast("double").as("__v")),
          struct(lit(1).as("__m"), col("l_extendedprice").cast("double").as("__v")))).as("__e"))
      .select(col("__k"), col("__e.__m").as("__m"), col("__e.__v").as("__v"),
        col("__qa"), col("__qo"), col("__ls"))
      .withColumn("__b",
        when(isQ, floor(col("__v"))).otherwise(floor(col("__v") / 100.0)).cast("long"))
      .groupBy(col("__k"), col("__m"), col("__b"))
      .agg(count(lit(1)).as("__c"),
        expr("bool_and(CASE WHEN __m = 0 THEN __qa END)").as("__ba"),
        expr("bool_or(CASE WHEN __m = 0 THEN __qo END)").as("__bo"),
        min(when(isQ, col("__ls"))).as("__mn"))
      .withColumn("__p", when(isQ, lit(0.5)).otherwise(lit(0.9)))
      .localCheckpoint()
    def mkPreparedB(): DataFrame = li
      .select(ascii(col("l_returnflag")).as("__k"),
        explode(array(
          struct(lit(0).as("__m"), col("l_quantity").cast("double").as("__v")),
          struct(lit(1).as("__m"), col("l_extendedprice").cast("double").as("__v")))).as("__e"))
      .select(col("__k"), col("__e.__m").as("__m"), col("__e.__v").as("__v"))
      .withColumn("__b",
        when(col("__m") === 0, floor(col("__v"))).otherwise(floor(col("__v") / 100.0)).cast("long"))
    for (_ <- 1 to 4) {
      val t0 = System.nanoTime()
      val coarse = mkCoarse()
      val t1 = System.nanoTime()
      val base = coarse.groupBy(col("__k"))
        .agg(expr("bool_and(__ba)").as("all_pos"), expr("bool_or(__bo)").as("any_big_disc"),
          expr("char(min(__mn))").as("one_status"))
      val percs = ExactPercentile.refinedFromCoarse(coarse, mkPreparedB(), Seq("__k", "__m"))
        .groupBy(col("__k"))
        .agg(max(when(isQ, col("res"))).as("med_raw"),
          max(when(col("__m") === 1, col("res"))).as("p90_raw"))
      val fin = base.join(broadcast(percs), Seq("__k"), "left")
        .select(expr("char(__k)").as("l_returnflag"),
          round(col("med_raw"), 4).as("med_qty"), round(col("p90_raw"), 4).as("p90_price"),
          col("all_pos"), col("any_big_disc"), col("one_status"))
        .orderBy(col("l_returnflag"))
      val t2 = System.nanoTime()
      sink(fin)
      val t3 = System.nanoTime()
      println(f"PROFILEE phaseA ${(t1 - t0) / 1e9}%.3f build ${(t2 - t1) / 1e9}%.3f exec ${(t3 - t2) / 1e9}%.3f")
    }
    spark.stop()
  }
}
// appended scratch: round-7 candidate — cross-agg phase A (no explode),
// qty median straight from cum (bucket = exact value), single-measure
// narrow phase B for price.
object ProfileQ41f {
  import org.apache.spark.sql.DataFrame
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def sink(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    val li = Tables.df(spark, dir, "lineitem")
    val isQ = col("__m") === 0

    def q41f(): DataFrame = {
      // One 600k-row hash agg on the (flag, qty-value, price-bucket) cross:
      // both domains bounded => cross bounded (~156k cells at sf0.1).
      val cross = li.groupBy(
          ascii(col("l_returnflag")).as("__k"),
          col("l_quantity").cast("double").as("__q"),
          floor(col("l_extendedprice").cast("double") / 100.0).as("__pb"))
        .agg(count(lit(1)).as("__c"),
          expr("bool_and(l_quantity >= 1)").as("__qa"),
          expr("bool_or(l_discount > 0.09)").as("__qo"),
          min(ascii(col("l_linestatus"))).as("__ls"))
      // Melt the small cross into per-measure histograms.
      val coarse = cross.select(col("__k"), col("__c"), col("__qa"), col("__qo"), col("__ls"),
          explode(array(
            struct(lit(0).as("__m"), col("__q").as("__b")),
            struct(lit(1).as("__m"), col("__pb").as("__b")))).as("__e"))
        .select(col("__k"), col("__e.__m").as("__m"), col("__e.__b").as("__b"),
          col("__c"), col("__qa"), col("__qo"), col("__ls"))
        .groupBy(col("__k"), col("__m"), col("__b"))
        .agg(sum(col("__c")).as("__c"),
          expr("bool_and(CASE WHEN __m = 0 THEN __qa END)").as("__ba"),
          expr("bool_or(CASE WHEN __m = 0 THEN __qo END)").as("__bo"),
          min(when(isQ, col("__ls"))).as("__mn"))
        .withColumn("__p", when(isQ, lit(0.5)).otherwise(lit(0.9)))
      val cum = ExactPercentile.cumulate(coarse, Seq("__k", "__m")).localCheckpoint()
      // Phase B: price only — no explode, two columns.
      val preparedB = li.select(ascii(col("l_returnflag")).as("__k"),
          col("l_extendedprice").cast("double").as("__v"))
        .withColumn("__b", floor(col("__v") / 100.0))
      val percs = ExactPercentile.selectFromCum(
        cum.filter(col("__m") === 1).drop("__m"), preparedB, Seq("__k"), "p90_raw")
      // Final union-reduce: qty median interpolates cum's bucket VALUES
      // (bucket = the raw value for measure 0 -> exact).
      val fromCum = cum.select(col("__k"), col("__b"), col("__c"), col("__cum"), col("__n"),
        col("__m"), col("__ba"), col("__bo"), col("__mn"),
        lit(null).cast("double").as("p90_raw"))
      val fromPercs = percs.select(col("__k"),
        lit(null).cast("double").as("__b"), lit(null).cast("long").as("__c"),
        lit(null).cast("long").as("__cum"), lit(null).cast("long").as("__n"),
        lit(null).cast("int").as("__m"),
        lit(null).cast("boolean").as("__ba"), lit(null).cast("boolean").as("__bo"),
        lit(null).cast("int").as("__mn"), col("p90_raw"))
      val pos = lit(0.5) * (col("__n") - 1).cast("double")
      def at(r: org.apache.spark.sql.Column) =
        max(when(isQ && col("__cum") - col("__c") <= r && col("__cum") > r, col("__b")))
      val lo = at(floor(pos))
      val hi = at(ceil(pos))
      val frac = max(when(isQ, pos - floor(pos)))
      fromCum.unionAll(fromPercs)
        .groupBy(col("__k"))
        .agg(
          round(lo + (hi - lo) * frac, 4).as("med_qty"),
          round(max(col("p90_raw")), 4).as("p90_price"),
          expr("bool_and(__ba)").as("all_pos"),
          expr("bool_or(__bo)").as("any_big_disc"),
          expr("char(min(__mn))").as("one_status"))
        .select(expr("char(__k)").as("l_returnflag"),
          col("med_qty"), col("p90_price"),
          col("all_pos"), col("any_big_disc"), col("one_status"))
        .orderBy(col("l_returnflag"))
    }
    for (_ <- 1 to 5) {
      val t0 = System.nanoTime()
      sink(q41f())
      println(f"PROFILEF q41f_total ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    q41f().show(10, false)
    spark.stop()
  }
}
// appended scratch: round-7 candidate G — melt phase A as shipped (1.2M
// hash agg collapses to ~3k buckets map-side), qty median from cum,
// narrow single-measure phase B.
object ProfileQ41g {
  import org.apache.spark.sql.DataFrame
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def sink(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    val li = Tables.df(spark, dir, "lineitem")
    val isQ = col("__m") === 0

    def q41g(): DataFrame = {
      val coarse = li
        .select(
          ascii(col("l_returnflag")).as("__k"),
          (col("l_quantity") >= 1).as("__qa"),
          (col("l_discount") > 0.09).as("__qo"),
          ascii(col("l_linestatus")).as("__ls"),
          explode(array(
            struct(lit(0).as("__m"), col("l_quantity").cast("double").as("__v")),
            struct(lit(1).as("__m"), col("l_extendedprice").cast("double").as("__v")))).as("__e"))
        .withColumn("__m", col("__e.__m")).withColumn("__v", col("__e.__v"))
        .drop("__e")
        .filter(col("__v").isNotNull)
        .withColumn("__b", when(isQ, col("__v")).otherwise(floor(col("__v") / 100.0)))
        .groupBy(col("__k"), col("__m"), col("__b"))
        .agg(count(lit(1)).as("__c"),
          expr("bool_and(CASE WHEN __m = 0 THEN __qa END)").as("__ba"),
          expr("bool_or(CASE WHEN __m = 0 THEN __qo END)").as("__bo"),
          min(when(isQ, col("__ls"))).as("__mn"))
        .withColumn("__p", when(isQ, lit(0.5)).otherwise(lit(0.9)))
      val cum = ExactPercentile.cumulate(coarse, Seq("__k", "__m")).localCheckpoint()
      val preparedB = li.select(ascii(col("l_returnflag")).as("__k"),
          col("l_extendedprice").cast("double").as("__v"))
        .withColumn("__b", floor(col("__v") / 100.0))
      val percs = ExactPercentile.selectFromCum(
        cum.filter(col("__m") === 1).drop("__m"), preparedB, Seq("__k"), "p90_raw")
      val fromCum = cum.select(col("__k"), col("__b"), col("__c"), col("__cum"), col("__n"),
        col("__m"), col("__ba"), col("__bo"), col("__mn"),
        lit(null).cast("double").as("p90_raw"))
      val fromPercs = percs.select(col("__k"),
        lit(null).cast("double").as("__b"), lit(null).cast("long").as("__c"),
        lit(null).cast("long").as("__cum"), lit(null).cast("long").as("__n"),
        lit(null).cast("int").as("__m"),
        lit(null).cast("boolean").as("__ba"), lit(null).cast("boolean").as("__bo"),
        lit(null).cast("int").as("__mn"), col("p90_raw"))
      val pos = lit(0.5) * (col("__n") - 1).cast("double")
      def at(r: org.apache.spark.sql.Column) =
        max(when(isQ && col("__cum") - col("__c") <= r && col("__cum") > r, col("__b")))
      val lo = at(floor(pos))
      val hi = at(ceil(pos))
      val frac = max(when(isQ, pos - floor(pos)))
      fromCum.unionAll(fromPercs)
        .groupBy(col("__k"))
        .agg(
          round(lo + (hi - lo) * frac, 4).as("med_qty"),
          round(max(col("p90_raw")), 4).as("p90_price"),
          expr("bool_and(__ba)").as("all_pos"),
          expr("bool_or(__bo)").as("any_big_disc"),
          expr("char(min(__mn))").as("one_status"))
        .select(expr("char(__k)").as("l_returnflag"),
          col("med_qty"), col("p90_price"),
          col("all_pos"), col("any_big_disc"), col("one_status"))
        .orderBy(col("l_returnflag"))
    }
    for (_ <- 1 to 5) {
      val t0 = System.nanoTime()
      sink(q41g())
      println(f"PROFILEG q41g_total ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    q41g().show(10, false)
    spark.stop()
  }
}
// appended scratch: alternate current-vs-candidate in one session
object ProfileQ41h {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def sink(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    def cur() = graft.SparkEntry.queries("q41_agg_extra")(spark, dir)
    // warm both
    sink(cur())
    val ts = scala.collection.mutable.Map("cur" -> Vector.empty[Double])
    for (i <- 1 to 7) {
      val t0 = System.nanoTime(); sink(cur())
      ts("cur") = ts("cur") :+ (System.nanoTime() - t0) / 1e9
    }
    println("PROFILEH cur trials " + ts("cur").map(t => f"$t%.2f").mkString(","))
    println(f"PROFILEH cur median ${ts("cur").sorted.apply(ts("cur").size / 2)}%.3f min ${ts("cur").min}%.3f")
    spark.stop()
  }
}
// appended scratch: H2 — checkpoint, then base + targets as tiny broadcasts,
// ONE final probe job (no union-reduce tail).
object ProfileQ41i {
  import org.apache.spark.sql.{Column, DataFrame}
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def sink(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    val li = Tables.df(spark, dir, "lineitem")
    val isQ = col("__m") === 0

    def h2(): DataFrame = {
      val coarse = li
        .select(
          ascii(col("l_returnflag")).as("__k"),
          (col("l_quantity") >= 1).as("__qa"),
          (col("l_discount") > 0.09).as("__qo"),
          ascii(col("l_linestatus")).as("__ls"),
          explode(array(
            struct(lit(0).as("__m"), col("l_quantity").cast("double").as("__v")),
            struct(lit(1).as("__m"), col("l_extendedprice").cast("double").as("__v")))).as("__e"))
        .withColumn("__m", col("__e.__m")).withColumn("__v", col("__e.__v"))
        .drop("__e")
        .filter(col("__v").isNotNull)
        .withColumn("__b", when(isQ, col("__v")).otherwise(floor(col("__v") / 100.0)))
        .groupBy(col("__k"), col("__m"), col("__b"))
        .agg(count(lit(1)).as("__c"),
          expr("bool_and(CASE WHEN __m = 0 THEN __qa END)").as("__ba"),
          expr("bool_or(CASE WHEN __m = 0 THEN __qo END)").as("__bo"),
          min(when(isQ, col("__ls"))).as("__mn"))
        .withColumn("__p", when(isQ, lit(0.5)).otherwise(lit(0.9)))
      val cum = ExactPercentile.cumulate(coarse, Seq("__k", "__m")).localCheckpoint()
      // base: bools + qty median (bucket = value for m=0) — one tiny agg
      val pos = lit(0.5) * (col("__n") - 1).cast("double")
      def at(r: Column) =
        max(when(isQ && col("__cum") - col("__c") <= r && col("__cum") > r, col("__b")))
      val lo = at(floor(pos)); val hi = at(ceil(pos))
      val frac = max(when(isQ, pos - floor(pos)))
      val base = cum.groupBy(col("__k")).agg(
        round(lo + (hi - lo) * frac, 4).as("med_qty"),
        expr("bool_and(__ba)").as("all_pos"),
        expr("bool_or(__bo)").as("any_big_disc"),
        expr("char(min(__mn))").as("one_status"))
      val preparedB = li.select(ascii(col("l_returnflag")).as("__k"),
          col("l_extendedprice").cast("double").as("__v"))
        .withColumn("__b", floor(col("__v") / 100.0))
      val percs = ExactPercentile.selectFromCum(
        cum.filter(col("__m") === 1).drop("__m"), preparedB, Seq("__k"), "p90_raw")
      percs.join(broadcast(base), Seq("__k"))
        .select(expr("char(__k)").as("l_returnflag"),
          col("med_qty"), round(col("p90_raw"), 4).as("p90_price"),
          col("all_pos"), col("any_big_disc"), col("one_status"))
        .orderBy(col("l_returnflag"))
    }
    def cur() = graft.SparkEntry.queries("q41_agg_extra")(spark, dir)
    sink(cur()); sink(h2())
    var tc, th = Vector.empty[Double]
    for (_ <- 1 to 6) {
      val t0 = System.nanoTime(); sink(cur()); tc :+= (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); sink(h2()); th :+= (System.nanoTime() - t1) / 1e9
    }
    def stats(n: String, v: Vector[Double]) =
      println(f"PROFILEI $n median ${v.sorted.apply(v.size / 2)}%.3f min ${v.min}%.3f trials ${v.map(t => f"$t%.2f").mkString(",")}")
    stats("cur", tc); stats("h2", th)
    h2().show(10, false)
    spark.stop()
  }
}
// appended scratch: decompose q41's floor — phase-A job alone, probe scan
// alone, empty-job overhead, scan-only.
object ProfileQ41j {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def sink(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    val li = Tables.df(spark, dir, "lineitem")
    val isQ = col("__m") === 0
    def time(name: String, warm: Int = 1)(f: => Unit): Unit = {
      (1 to warm).foreach(_ => f)
      val ts = (1 to 5).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"PROFILEJ $name median ${ts.sorted.apply(2)}%.3f min ${ts.min}%.3f")
    }
    def coarse() = li
      .select(
        ascii(col("l_returnflag")).as("__k"),
        (col("l_quantity") >= 1).as("__qa"),
        (col("l_discount") > 0.09).as("__qo"),
        ascii(col("l_linestatus")).as("__ls"),
        explode(array(
          struct(lit(0).as("__m"), col("l_quantity").cast("double").as("__v")),
          struct(lit(1).as("__m"), col("l_extendedprice").cast("double").as("__v")))).as("__e"))
      .withColumn("__m", col("__e.__m")).withColumn("__v", col("__e.__v"))
      .drop("__e")
      .filter(col("__v").isNotNull)
      .withColumn("__b", when(isQ, col("__v")).otherwise(floor(col("__v") / 100.0)))
      .groupBy(col("__k"), col("__m"), col("__b"))
      .agg(count(lit(1)).as("__c"))
    time("empty_job")(sink(spark.range(0, 1).toDF("id")))
    time("scan5col")(sink(li.select(col("l_returnflag"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"), col("l_linestatus"))))
    time("scan2col")(sink(li.select(col("l_returnflag"), col("l_extendedprice"))))
    time("phaseA_agg")(sink(coarse()))
    time("phaseA_ckpt") { ExactPercentile.cumulate(coarse().withColumn("__p", lit(0.5)), Seq("__k", "__m")).localCheckpoint() }
    time("probe_join") {
      import spark.implicits._
      val targets = Seq((65, 944.0, 100L, 600000L, 0.9), (78, 945.0, 100L, 600000L, 0.9),
        (82, 946.0, 100L, 600000L, 0.9)).toDF("__k", "__b", "__t_below", "__t_n", "__t_p")
      sink(li.select(ascii(col("l_returnflag")).as("__k"),
          col("l_extendedprice").cast("double").as("__v"))
        .withColumn("__b", floor(col("__v") / 100.0))
        .join(broadcast(targets), Seq("__k", "__b"))
        .groupBy(col("__k"))
        .agg(sort_array(collect_list(col("__v"))).as("__vs")))
    }
    spark.stop()
  }
}
// appended scratch: current q41 algorithm, but phase A + probe read the
// SPREAD lineitem (single-row-group file otherwise pins the melt to 1 core)
object ProfileQ41k {
  import org.apache.spark.sql.DataFrame
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def sink(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    val li = Tables.dfSpread(spark, dir, "lineitem")
    val isQ = col("__m") === 0
    def spread(): DataFrame = {
      def melted(extra: org.apache.spark.sql.Column*): DataFrame = li
        .select(Seq(ascii(col("l_returnflag")).as("__k")) ++ extra :+
          explode(array(
            struct(lit(0).as("__m"), col("l_quantity").cast("double").as("__v")),
            struct(lit(1).as("__m"), col("l_extendedprice").cast("double").as("__v")))).as("__e"): _*)
        .withColumn("__m", col("__e.__m")).withColumn("__v", col("__e.__v"))
        .drop("__e")
        .filter(col("__v").isNotNull)
        .withColumn("__b",
          when(isQ, floor(col("__v"))).otherwise(floor(col("__v") / 100.0)).cast("long"))
      val coarse = melted(
          (col("l_quantity") >= 1).as("__qa"),
          (col("l_discount") > 0.09).as("__qo"),
          ascii(col("l_linestatus")).as("__ls"))
        .groupBy(col("__k"), col("__m"), col("__b"))
        .agg(count(lit(1)).as("__c"),
          expr("bool_and(CASE WHEN __m = 0 THEN __qa END)").as("__ba"),
          expr("bool_or(CASE WHEN __m = 0 THEN __qo END)").as("__bo"),
          min(when(isQ, col("__ls"))).as("__mn"))
        .withColumn("__p", when(isQ, lit(0.5)).otherwise(lit(0.9)))
      val cum = ExactPercentile.cumulate(coarse, Seq("__k", "__m")).localCheckpoint()
      val percs = ExactPercentile.selectMultiMeasureFromCum(
        cum,
        li.select(ascii(col("l_returnflag")).as("__k"),
          col("l_quantity").cast("double").as("__q"),
          col("l_extendedprice").cast("double").as("__pr")),
        Seq("__k"),
        Seq(
          (0, col("__q"), floor(col("__q"))),
          (1, col("__pr"), floor(col("__pr") / 100.0))))
      val fromCum = cum.select(col("__k"),
        col("__ba"), col("__bo"), col("__mn"),
        lit(null).cast("int").as("__m"), lit(null).cast("double").as("res"))
      val fromPercs = percs.select(col("__k"),
        lit(null).cast("boolean").as("__ba"), lit(null).cast("boolean").as("__bo"),
        lit(null).cast("int").as("__mn"), col("__m"), col("res"))
      fromCum.unionAll(fromPercs)
        .groupBy(col("__k"))
        .agg(
          round(max(when(isQ, col("res"))), 4).as("med_qty"),
          round(max(when(col("__m") === 1, col("res"))), 4).as("p90_price"),
          expr("bool_and(__ba)").as("all_pos"),
          expr("bool_or(__bo)").as("any_big_disc"),
          expr("char(min(__mn))").as("one_status"))
        .select(
          expr("char(__k)").as("l_returnflag"),
          col("med_qty"), col("p90_price"),
          col("all_pos"), col("any_big_disc"), col("one_status"))
        .orderBy(col("l_returnflag"))
    }
    def cur() = graft.SparkEntry.queries("q41_agg_extra")(spark, dir)
    sink(cur()); sink(spread())
    var tc, tsv = Vector.empty[Double]
    for (_ <- 1 to 6) {
      val t0 = System.nanoTime(); sink(cur()); tc :+= (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); sink(spread()); tsv :+= (System.nanoTime() - t1) / 1e9
    }
    def stats(n: String, v: Vector[Double]) =
      println(f"PROFILEK $n median ${v.sorted.apply(v.size / 2)}%.3f min ${v.min}%.3f trials ${v.map(t => f"$t%.2f").mkString(",")}")
    stats("cur", tc); stats("spread", tsv)
    spread().show(10, false)
    spark.stop()
  }
}
// appended scratch: fused single-long agg/join keys + H2 tail
object ProfileQ41m {
  import org.apache.spark.sql.{Column, DataFrame}
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def sink(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    val li = Tables.df(spark, dir, "lineitem")
    def fused(): DataFrame = {
      // __kk = (ascii(flag)*2 + m) << 32 | bucket  — one long hash-agg key
      val isQ = (col("__kk") % lit(2L << 32)) < lit(1L << 32)  // placeholder, decoded later
      val melted = li
        .select(
          (ascii(col("l_returnflag")).cast("long") * 2).as("__k2"),
          (col("l_quantity") >= 1).as("__qa"),
          (col("l_discount") > 0.09).as("__qo"),
          ascii(col("l_linestatus")).as("__ls"),
          col("l_quantity").cast("double").as("__q"),
          col("l_extendedprice").cast("double").as("__pr"))
        .select(col("__k2"), col("__qa"), col("__qo"), col("__ls"),
          explode(array(
            (shiftleft(col("__k2"), 32) + col("__q").cast("long")).as("a"),
            (shiftleft(col("__k2") + 1, 32) + floor(col("__pr") / 100.0).cast("long")).as("b"))).as("__kk"))
      val isM0 = pmod(shiftright(col("__kk"), 32), lit(2L)) === 0
      val coarse = melted
        .groupBy(col("__kk"))
        .agg(count(lit(1)).as("__c"),
          expr("bool_and(CASE WHEN pmod(shiftright(__kk,32),2)=0 THEN __qa END)").as("__ba"),
          expr("bool_or(CASE WHEN pmod(shiftright(__kk,32),2)=0 THEN __qo END)").as("__bo"),
          min(when(isM0, col("__ls"))).as("__mn"))
        .select(
          shiftright(col("__kk"), 33).as("__k"),
          pmod(shiftright(col("__kk"), 32), lit(2L)).cast("int").as("__m"),
          pmod(col("__kk"), lit(1L << 32)).cast("double").as("__b"),
          col("__c"), col("__ba"), col("__bo"), col("__mn"))
        .withColumn("__p", when(col("__m") === 0, lit(0.5)).otherwise(lit(0.9)))
      val cum = ExactPercentile.cumulate(coarse, Seq("__k", "__m")).localCheckpoint()
      val isQ2 = col("__m") === 0
      val pos = lit(0.5) * (col("__n") - 1).cast("double")
      def at(r: Column) =
        max(when(isQ2 && col("__cum") - col("__c") <= r && col("__cum") > r, col("__b")))
      val lo = at(floor(pos)); val hi = at(ceil(pos))
      val frac = max(when(isQ2, pos - floor(pos)))
      val base = cum.groupBy(col("__k")).agg(
        round(lo + (hi - lo) * frac, 4).as("med_qty"),
        expr("bool_and(__ba)").as("all_pos"),
        expr("bool_or(__bo)").as("any_big_disc"),
        expr("char(min(__mn))").as("one_status"))
      // fused probe key: (k*2+1)<<32 | pricebucket
      val preparedB = li.select(
          (shiftleft(ascii(col("l_returnflag")).cast("long") * 2 + 1, 32) +
            floor(col("l_extendedprice").cast("double") / 100.0).cast("long")).as("__kb"),
          col("l_extendedprice").cast("double").as("__v"))
      val cumP = cum.filter(col("__m") === 1)
        .select((shiftleft(col("__k") * 2 + 1, 32) + col("__b").cast("long")).as("__kb"),
          col("__k"), col("__c"), col("__p"), col("__cum"), col("__n"))
      val posB = col("__p") * (col("__n") - 1).cast("double")
      val wanted = Seq(floor(posB), ceil(posB))
        .map(r => col("__cum") - col("__c") <= r && col("__cum") > r).reduce(_ || _)
      val targets = cumP.filter(wanted)
        .select(col("__kb"), col("__k").as("__t_k"),
          (col("__cum") - col("__c")).as("__t_below"), col("__n").as("__t_n"),
          col("__p").as("__t_p"))
      val packed = preparedB.join(broadcast(targets), Seq("__kb"))
        .groupBy(col("__t_k"))
        .agg(sort_array(collect_list(col("__v"))).as("__vs"),
          min(col("__t_below")).as("__start"), min(col("__t_n")).as("__nn"),
          first(col("__t_p")).as("__pp"))
      val posF = col("__pp") * (col("__nn") - 1).cast("double")
      val loF = floor(posF)
      def atF(r: Column): Column =
        element_at(col("__vs"), (r - col("__start")).cast("int") + 1)
      val vLo = atF(loF); val vHi = atF(ceil(posF))
      packed.select(col("__t_k").as("__k"),
          (vLo + (vHi - vLo) * (posF - loF)).as("p90_raw"))
        .join(broadcast(base), Seq("__k"))
        .select(expr("char(__k)").as("l_returnflag"),
          col("med_qty"), round(col("p90_raw"), 4).as("p90_price"),
          col("all_pos"), col("any_big_disc"), col("one_status"))
        .orderBy(col("l_returnflag"))
    }
    def cur() = graft.SparkEntry.queries("q41_agg_extra")(spark, dir)
    sink(cur()); sink(fused())
    var tc, tf = Vector.empty[Double]
    for (_ <- 1 to 6) {
      val t0 = System.nanoTime(); sink(cur()); tc :+= (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); sink(fused()); tf :+= (System.nanoTime() - t1) / 1e9
    }
    def stats(n: String, v: Vector[Double]) =
      println(f"PROFILEM $n median ${v.sorted.apply(v.size / 2)}%.3f min ${v.min}%.3f trials ${v.map(t => f"$t%.2f").mkString(",")}")
    stats("cur", tc); stats("fused", tf)
    fused().show(10, false)
    spark.stop()
  }
}
