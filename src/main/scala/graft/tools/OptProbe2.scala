package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** r18 scratch probe: stage-level decomposition of p191 (prefix-filtered
  * Jaccard) — times each pipeline segment against the noop sink to find
  * the dominant stage. Mirrors PipelineQueries49's body. */
object OptProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = GraftSession.builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    GraftSession.prepare(s)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe2] $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def rareDf() = {
      val docs = Tables.dfSpread(s, dir, "documents")
      val sh = docs.select(col("doc_id"),
        explode(array_distinct(graft.Functions.wordShingles(
          split(lower(col("text")), "\\s+"), 3))).as("shingle"))
      val nDocs = docs.agg(count(lit(1)).as("corpus_n"))
      sh.join(sh.groupBy(col("shingle")).agg(count(lit(1)).as("n_docs")), "shingle")
        .crossJoin(broadcast(nDocs))
        .filter(col("n_docs") <= greatest(lit(2L),
          floor(col("corpus_n") * 0.02).cast("bigint")))
        .select(col("doc_id"), col("shingle"), col("n_docs"))
    }

    for (rnd <- 1 to 3) {
      println(s"--- round $rnd ---")
      val docsets = rareDf().groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("n_docs"), col("shingle"))))
          .as("ranked"))
        .select(col("doc_id"),
          transform(col("ranked"), r => r.getField("shingle")).as("set"),
          size(col("ranked")).as("n"))
        .withColumn("sset", sort_array(col("set")))
      val dsc = time("docsets.ckpt")(docsets.localCheckpoint())
      val pref = dsc.select(col("doc_id"), col("n"),
        explode(slice(col("set"), lit(1), (col("n") / 2).cast("int") + 1))
          .as("shingle"))
      val cand = pref.alias("pa").join(pref.alias("pb"),
          col("pa.shingle") === col("pb.shingle")
            && col("pa.doc_id") < col("pb.doc_id")
            && col("pa.n") * 2 >= col("pb.n")
            && col("pb.n") * 2 >= col("pa.n"))
        .select(col("pa.doc_id").as("doc_a"), col("pb.doc_id").as("doc_b"))
        .distinct()
      val candC = time("cand(ckpt docsets)")(cand.count())
      println(s"[probe2] n_cand=$candC n_docsets=${dsc.count()}")
      val candCk = time("cand.ckpt")(cand.localCheckpoint())
      println(s"[probe2] cand partitions=${candCk.rdd.getNumPartitions}")
      val candSpread = candCk.repartition(s.sparkContext.defaultParallelism)
      val verified = candSpread
        .join(broadcast(dsc.select(col("doc_id").as("doc_a"), col("sset").as("sa"),
          col("n").as("na"))), "doc_a")
        .join(broadcast(dsc.select(col("doc_id").as("doc_b"), col("sset").as("sb"),
          col("n").as("nb"))), "doc_b")
        .withColumn("i",
          graft.functions.NativeExpressions.sortedIntersectCount(col("sa"), col("sb")))
      val jac = col("i").cast("double") / (col("na") + col("nb") - col("i"))
      time("verify-only(merge kernel)")(noop(verified.filter(jac >= 0.5)
        .select(col("doc_a"), col("doc_b"), round(jac, 6).as("jaccard"))))
      time("verify+sort(merge kernel)")(noop(verified.filter(jac >= 0.5)
        .select(col("doc_a"), col("doc_b"), round(jac, 6).as("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))))
    }
    s.stop()
  }
}
