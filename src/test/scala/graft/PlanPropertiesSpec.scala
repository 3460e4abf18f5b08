package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}

/** Plan-shape invariants for the scale-critical queries: these assert the
  * 100-TB qualities (pushdown reaching the scan, pruned read schemas,
  * broadcast dims, top-N fusion) rather than results, so a regression in
  * plan quality fails CI even while answers stay correct.
  */
class PlanPropertiesSpec extends AnyFunSuite {
  private val spark = SharedSpark.spark

  private def run(name: String): DataFrame =
    SparkEntry.queries(name)(spark, SharedSpark.sf)

  private def planOf(df: DataFrame): SparkPlan = {
    df.queryExecution.executedPlan.execute().count()
    df.queryExecution.executedPlan
  }

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[SparkPlan]
    def walk(x: SparkPlan): Unit = {
      buf += x
      x.children.foreach(walk)
      x match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
        case _ => ()
      }
      x.subqueries.foreach(walk)
    }
    walk(p)
    buf.toSeq
  }

  test("q40 (TPC-H Q6 shape): filters push into the parquet scan, schema pruned") {
    val scans = collectAll(planOf(run("q40_tpch_q6"))).collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    val s = scans.head
    assert(s.dataFilters.nonEmpty, "expected data filters at the scan")
    val readCols = s.requiredSchema.fieldNames.toSet
    assert(readCols.subsetOf(Set("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")),
      s"scan reads more than needed: $readCols")
  }

  test("q03 (projection): scan reads only referenced columns") {
    val scans = collectAll(planOf(run("q03_projection"))).collect { case f: FileSourceScanExec => f }
    val readCols = scans.head.requiredSchema.fieldNames.toSet
    assert(readCols == Set("n_nationkey", "n_name", "n_regionkey"),
      s"unexpected read schema: $readCols")
  }

  test("q39 (multijoin): dimensions broadcast — at most one shuffle join") {
    val nodes = collectAll(planOf(run("q39_multijoin")))
    val bhj = nodes.count(_.nodeName.contains("BroadcastHashJoin"))
    val smj = nodes.count(n => n.nodeName.contains("SortMergeJoin")
      || n.nodeName.contains("ShuffledHashJoin"))
    assert(bhj >= 3, s"expected >=3 broadcast joins, got $bhj")
    assert(smj <= 1, s"expected <=1 shuffle join, got $smj")
  }

  test("q19 (top-N): order+limit fuses to TakeOrderedAndProject") {
    val nodes = collectAll(planOf(run("q19_topn")))
    assert(nodes.exists(_.nodeName.contains("TakeOrderedAndProject")),
      s"no top-N fusion in: ${nodes.map(_.nodeName).distinct}")
  }

  test("q01 (group agg): partial aggregation before the exchange") {
    val nodes = collectAll(planOf(run("q01_group_agg")))
    val aggs = nodes.filter(_.nodeName.contains("HashAggregate"))
    assert(aggs.size >= 2, "expected partial+final HashAggregate pair")
    val exchanges = nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
    assert(exchanges <= 2, s"group-agg should shuffle once (+order), got $exchanges")
  }

  test("p07 (LSH signatures): map-only — no data-keyed shuffle before sort") {
    val nodes = collectAll(planOf(run("p07_similarity_lsh")))
    // Tables.dfSpread may add ONE round-robin exchange to parallelize the
    // single-row-group local scan; what the signature stage must never do
    // is shuffle on a DATA-derived key (hash/range on columns).
    val keyed = nodes.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e.outputPartitioning
    }.filterNot(_.isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning])
    // only the final ORDER BY may range-exchange
    assert(keyed.size <= 1, s"signature stage must not shuffle on a data key, got $keyed")
  }

  test("p17 (capped jaccard): DF via aggregate, no window over the shingle key") {
    val df = run("p17_dedup_jaccard_capped")
    val nodes = collectAll(planOf(df))
    assert(!nodes.exists(_.nodeName.contains("Window")),
      "document frequency must be aggregate+join-back, not a window over the shingle key")
    // one corpus scan for shingling + one 1-row count aggregate; the old
    // driver-side docs.count() third pass is gone
    val docScans = nodes.collect { case f: FileSourceScanExec => f }
      .count(_.requiredSchema.fieldNames.contains("text"))
    assert(docScans <= 2, s"expected <=2 documents scans (shingles + corpus count), got $docScans")
  }

  test("scalar subqueries broadcast — no driver-side collect (q23, q71)") {
    for (q <- Seq("q23_subquery_scalar", "q71_tpch_q22")) {
      // assert on the plan string: at tiny SF, AQE may collapse the final
      // plan to EmptyRelation, but the initial plan shows the broadcast
      val plan = planOf(run(q)).toString
      assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
        s"$q: expected the 1-row aggregate to arrive via broadcast:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"$q: 1-row side must broadcast, not cartesian-shuffle")
    }
  }

  test("whole-stage codegen covers the hot relational paths") {
    val nodes = collectAll(planOf(run("q04_filter_complex")))
    assert(nodes.exists(_.nodeName.contains("WholeStageCodegen")),
      "expected WholeStageCodegen spans")
  }

  test("q72 (contradiction): optimizer collapses the scan — no file read at all") {
    val nodes = collectAll(planOf(run("q72_contradiction_empty")))
    assert(!nodes.exists(_.isInstanceOf[FileSourceScanExec]),
      "WHERE 1=0 must propagate to an empty relation, not scan parquet")
  }

  test("q80 (VALUES join): the inline relation broadcasts") {
    val plan = planOf(run("q80_values_join")).toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      s"3-row VALUES side must broadcast:\n$plan")
  }

  test("q83 (TPC-H Q5): nation/region dims broadcast; no cartesian product") {
    val plan = planOf(run("q83_tpch_q5")).toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"dimension sides must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      "six-table join must stay hash/broadcast joins")
  }

  test("q86 (TPC-H Q21): EXISTS/NOT EXISTS become a semi+anti join chain") {
    val plan = planOf(run("q86_tpch_q21")).toString
    assert(plan.contains("LeftSemi"), s"EXISTS must plan as a left-semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"NOT EXISTS must plan as a left-anti join:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      "correlated subqueries must not fall back to a cartesian product")
  }

  test("p23 (semantic dedup): two-level centroids broadcast; pair emission has no self-join") {
    val nodes = collectAll(planOf(run("p23_semantic_dedup")))
    // the only nested-loop allowed is the corpus×super-centroids broadcast
    // (centroids are the tiny side); everything keyed must be hash
    assert(!nodes.exists(_.nodeName.contains("CartesianProduct")),
      "candidate generation must never be an all-pairs cartesian")
    // level 1: the super-centroid assignment cross join must be the
    // broadcast NLJ, and its broadcast child must be the filtered centroid
    // subplan (cvec projection), not a corpus-sized relation
    val bnljs = nodes.filter(_.nodeName.contains("BroadcastNestedLoopJoin"))
    assert(bnljs.nonEmpty, "super-centroid assignment must be a broadcast nested-loop join")
    assert(bnljs.exists { j =>
      collectAll(j).exists(n => n.nodeName.contains("BroadcastExchange")
        && n.toString.contains("cvec"))
    }, "the BNLJ's broadcast side must be the super-centroid subplan (cvec projection)")
    // level 2: the sub-centroid assignment must be a broadcast HASH join on
    // sup_id whose broadcast side carries the sub-centroid vectors (bv) —
    // the k1×k2 frame, never the corpus
    val bhjs = nodes.filter(_.nodeName.contains("BroadcastHashJoin"))
    assert(bhjs.exists { j =>
      collectAll(j).exists(n => n.nodeName.contains("BroadcastExchange")
        && n.toString.contains("bv"))
    }, "sub-centroid assignment must broadcast the k1*k2 sub-centroid frame (bv)")
    // candidate pairs come from per-cell collect_list + explode, not a
    // self-join of the assignment lineage (the q87 double-lineage class)
    assert(nodes.exists(n => n.nodeName.contains("Generate")),
      "pair emission must be the per-cell explode pattern")
  }

  test("q87 (TPC-H Q2 shape): dims broadcast; correlated min decorrelates — no cartesian") {
    val nodes = collectAll(planOf(run("q87_tpch_q2")))
    assert(!nodes.exists(_.nodeName.contains("CartesianProduct")),
      "cost-equality subquery must decorrelate to an aggregate join-back, not a cartesian")
    assert(nodes.exists(_.nodeName.contains("BroadcastHashJoin")),
      "supplier/nation/region dims must broadcast")
  }

  test("q88 (TPC-H Q11 shape): threshold arrives by broadcast, not a shuffled join") {
    val plan = planOf(run("q88_tpch_q11")).toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastNestedLoopJoin"),
      s"the 1-row threshold aggregate must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      "threshold cross join must broadcast, not cartesian-shuffle")
  }

  test("q15 (theta join): banded-range plan — no nested-loop, no cartesian") {
    val nodes = collectAll(planOf(run("q15_join_theta")))
    assert(!nodes.exists(_.nodeName.contains("BroadcastNestedLoopJoin")),
      "theta join must execute as the banded equi-join decomposition, not an O(n*m) NLJ")
    assert(!nodes.exists(_.nodeName.contains("CartesianProduct")),
      "theta join must not cartesian-shuffle")
  }

  test("p25 (unigram LM): scoring join broadcasts the capped vocabulary") {
    val nodes = collectAll(planOf(run("p25_unigram_lm")))
    assert(nodes.exists(n => n.nodeName.contains("BroadcastHashJoin")),
      "token scoring must be a map-side broadcast-hash-join — the corpus is never shuffled by token")
    assert(nodes.exists(_.nodeName.contains("TakeOrderedAndProject")),
      "vocabulary cap must be TakeOrdered top-k, not a single-partition global window")
  }

  test("p20 guard: oversized broadcast side falls back to an unhinted (shuffle) join") {
    val side = spark.range(0, 100).toDF("g")
    val hinted = operators.PipelineQueries3.broadcastIfSmall(side, 1000)
    assert(hinted.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "side under the threshold must carry the broadcast hint")
    val unhinted = operators.PipelineQueries3.broadcastIfSmall(side, 5)
    assert(!unhinted.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "side over the threshold must NOT be broadcast — shuffle join is the safe fallback")
  }

  test("p26 (bloom incremental): exact confirm is an anti-join after the bloom prefilter") {
    val plan = planOf(run("p26_bloom_incremental")).toString
    assert(plan.contains("LeftAnti"), s"confirm stage must be a left-anti join:\n$plan")
    assert(plan.contains("might_contain") || plan.contains("BloomFilter"),
      s"bloom prefilter must be in the plan (scalar-subquery bloom_filter_agg):\n$plan")
  }

  test("plan-only construction triggers no Spark jobs (p20 probe, p26 bloom — round-4 ADVICE)") {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        seen.add(js.stageInfos.map(_.name).mkString("; "))
        ()
      }
    }
    // pre-warm parquet schema/file-listing caches: the first read of a
    // table fires a metadata job regardless of the query shape, and that
    // is not what this test polices
    run("p20_contamination").queryExecution.executedPlan
    run("p26_bloom_incremental").queryExecution.executedPlan
    spark.sparkContext.addSparkListener(listener)
    try {
      // construct + compile the physical plan, never execute
      run("p20_contamination").queryExecution.executedPlan
      run("p26_bloom_incremental").queryExecution.executedPlan
      // sentinel job: once the listener has seen it, all prior events (the
      // bus is FIFO) have drained; under AQE the sentinel may appear as
      // several CompletableFuture-stage jobs, so the assertion filters to
      // jobs rooted in graft code (scans, probes, bloom builds)
      spark.range(1).count()
      val deadline = System.nanoTime() + 10e9.toLong
      while (jobs.get() < 1 && System.nanoTime() < deadline) Thread.sleep(50)
      val offenders = seen.toArray(Array.empty[String]).filter(s =>
        s.contains("Tables.scala") || s.contains("PipelineQueries") ||
          s.contains("bloomFilter") || s.contains("count at PipelineQueries"))
      assert(offenders.isEmpty,
        s"plan-only construction must trigger zero graft jobs, saw: ${offenders.mkString(" | ")}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("q41/q76: exact percentile/median via bounded histograms — no group-buffering aggregate") {
    // Spark's Percentile/Median TypedImperativeAggregate collects every group
    // value into a single buffer — the last per-group O(n) state the round-5
    // audit found. ExactPercentile replaces it; keep it out of these plans.
    for (name <- Seq("q41_agg_extra", "q76_median")) {
      val df = run(name)
      val all = (df.queryExecution.optimizedPlan.toString
        + "\n" + planOf(df).toString)
      assert(!all.contains("percentile(") && !all.contains("Percentile")
        && !all.contains("median(") && !all.contains("Median"),
        s"$name must not contain a group-buffering Percentile/Median aggregate:\n$all")
    }
  }

  test("p43 (label centroids): centroid table broadcasts; no sort-merge join") {
    val plan = planOf(run("p43_label_centroids"))
    val nodes = collectAll(plan)
    assert(nodes.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      "centroid join must be a broadcast hash join")
    assert(!nodes.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
      "a labels-sized centroid table must never sort-merge against the corpus")
  }

  test("p45 (vocab KL): per-source and per-word stats arrive by broadcast") {
    val plan = planOf(run("p45_vocab_kl"))
    val nodes = collectAll(plan)
    val bhj = nodes.count(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.BroadcastHashJoinExec])
    assert(bhj >= 2, s"expected ts and qw joined by broadcast, saw $bhj BHJ")
    assert(!nodes.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
      "vocabulary-sized stat tables must never sort-merge")
  }

  test("p40/p44: map-side partial aggregation precedes the only shuffle") {
    // p40's first groupBy collapses the corpus to its vocabulary and p44's
    // split agg collapses it to three rows — both depend on partial
    // (map-side) aggregation so the corpus-sized shuffle moves keys, not
    // rows. HashAggregate appearing below the exchange is that guarantee.
    for (name <- Seq("p40_bpe_pairs", "p44_leakage_safe_split")) {
      val plan = planOf(run(name))
      val nodes = collectAll(plan)
      val partialAggs = nodes.collect {
        case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec
          if h.aggregateExpressions.exists(_.mode ==
            org.apache.spark.sql.catalyst.expressions.aggregate.Partial) => h
      }
      assert(partialAggs.nonEmpty, s"$name: no map-side partial aggregation found")
    }
  }

  test("p47 (k-means): assignment is map-only — centroids broadcast, never shuffled") {
    val nodes = collectAll(planOf(run("p47_kmeans_embeddings")))
    // the packed single-row centroid frame rides a BroadcastNestedLoopJoin
    // (the audited-benign 1-row class); the corpus must never reach a
    // shuffled join to be assigned
    assert(nodes.exists(_.nodeName.contains("BroadcastNestedLoopJoin")),
      "expected the packed centroid row to arrive by broadcast")
    assert(!nodes.exists(_.nodeName.contains("SortMergeJoin")) &&
      !nodes.exists(_.nodeName.contains("ShuffledHashJoin")),
      "k-means assignment must not shuffle the corpus into a join")
    assert(!nodes.exists(_.nodeName.contains("CartesianProduct")),
      "no cartesian product in the k-means plan")
  }

  test("p46/p51: vocabulary/stat tables arrive by broadcast — no sort-merge join") {
    for (name <- Seq("p46_pmi_collocations", "p51_embed_quantize")) {
      val nodes = collectAll(planOf(run(name)))
      assert(nodes.exists(_.nodeName.contains("BroadcastHashJoin")),
        s"$name: expected broadcast joins for the bounded stat tables")
      assert(!nodes.exists(_.nodeName.contains("SortMergeJoin")),
        s"$name: a vocabulary/dims-sized table must never sort-merge against the corpus")
    }
  }

  test("p50 (source overlap): one gram-keyed shuffle join; count tables broadcast") {
    val nodes = collectAll(planOf(run("p50_source_overlap")))
    val shuffled = nodes.count(n => n.nodeName.contains("SortMergeJoin") ||
      n.nodeName.contains("ShuffledHashJoin"))
    assert(shuffled <= 1,
      s"expected at most the intersection join to shuffle, saw $shuffled shuffled joins")
    val bhj = nodes.count(_.nodeName.contains("BroadcastHashJoin"))
    assert(bhj >= 2, s"expected per-source distinct counts joined by broadcast, saw $bhj")
  }

  test("p53 (length quantiles): bounded-histogram module — no group-buffering aggregate") {
    // same invariant as q41/q76: the quartiles must come from the
    // ExactPercentile histogram, never Spark's Percentile/Median
    // TypedImperativeAggregate whose per-group buffer is O(rows)
    val df = run("p53_length_quantiles")
    val all = df.queryExecution.optimizedPlan.toString + "\n" + planOf(df).toString
    assert(!all.contains("percentile(") && !all.contains("Percentile")
      && !all.contains("median(") && !all.contains("Median"),
      "p53 must not contain a group-buffering Percentile/Median aggregate")
    // and the sources-sized quartile frame must broadcast back, not SMJ
    assert(!collectAll(planOf(df)).exists(_.nodeName.contains("SortMergeJoin")),
      "the quartile frame must broadcast back onto the corpus")
  }

  test("p54 (hard negatives): query set broadcasts; argmax by partial agg, no window sort") {
    val nodes = collectAll(planOf(run("p54_hard_negatives")))
    assert(!nodes.exists(_.nodeName.contains("SortMergeJoin")) &&
      !nodes.exists(_.nodeName.contains("ShuffledHashJoin")),
      "the corpus must never shuffle into the scoring join")
    assert(!nodes.exists(_.nodeName.contains("Window")),
      "per-query argmax must be aggregation, not a window sort")
    assert(!nodes.exists(_.nodeName.contains("CartesianProduct")),
      "no cartesian product — the query subset rides a broadcast")
  }

  test("p84 banding kernel: shingle array and signature computed once per scan") {
    // r10 regression class: the shingle-less-doc exclusion as a separate
    // .where() was pushed below the projection, re-inlining the shingle
    // kernel into both Filter and Project (2.4x row-local tax on p84 AND
    // the streaming ingest screen). The lambda-bound spelling keeps one
    // occurrence; this pins it.
    val docs = Tables.df(spark, SharedSpark.sf, "documents")
    val bands = graft.streaming.DocumentStreams.bandTable(docs)
    val plan = planOf(bands).toString
    def count(hay: String, needle: String): Int =
      hay.sliding(needle.length).count(_ == needle)
    assert(count(plan, "minhash_signature") == 1,
      s"minhash signature must be computed exactly once, plan:\n$plan")
    assert(count(plan, "array_distinct") == 1,
      s"the shingle array must be computed exactly once, plan:\n$plan")
  }

  test("p56 (product quantization): coding is map-only — codebooks broadcast") {
    val nodes = collectAll(planOf(run("p56_product_quantization")))
    assert(nodes.exists(_.nodeName.contains("BroadcastHashJoin")),
      "expected the per-subspace codebook to arrive by broadcast hash join")
    assert(!nodes.exists(_.nodeName.contains("SortMergeJoin")),
      "the corpus must never sort-merge to be PQ-coded")
    assert(!nodes.exists(_.nodeName.contains("CartesianProduct")),
      "no cartesian product in the PQ plan")
  }

  test("p248 (G2 keyness): vocabulary top-k is TakeOrderedAndProject, not a global sort") {
    val nodes = collectAll(planOf(run("p248_dunning_g2")))
    assert(nodes.exists(_.nodeName.contains("TakeOrderedAndProject")),
      s"no distributed top-k in: ${nodes.map(_.nodeName).distinct}")
    assert(!nodes.exists(_.nodeName.contains("CartesianProduct")))
  }

  test("p230 (RBO): the re-ranked top-20 path plans no corpus-sized global sort") {
    // partial top-k per shuffle partition (pid-partitioned window) feeds
    // the global re-rank; the only un-partitioned windows must sit above
    // a Filter on the partition-local rank (r17 VERDICT #7 rework)
    val nodes = collectAll(planOf(run("p230_rbo_token_ranks")))
    val sorts = nodes.collect {
      case st: org.apache.spark.sql.execution.SortExec if st.global => st }
    // global SortExec only for the final tiny ORDER BY / re-rank frames;
    // none may sit directly on a scan/exchange of the token-count frame
    sorts.foreach { st =>
      val below = collectAll(st.child).map(_.nodeName)
      assert(below.exists(n => n.contains("Filter") || n.contains("Window")
          || n.contains("TakeOrdered") || n.contains("HashAggregate")),
        s"global sort directly over raw data: $below")
    }
  }
}
