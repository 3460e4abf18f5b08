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
