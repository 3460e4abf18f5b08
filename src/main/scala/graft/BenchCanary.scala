package graft

/** Load-flag decision for the bench canary, factored out of [[Bench]] so the
  * edge cases are unit-testable (round-5 follow-up — the logic was only
  * exercised end-to-end, so an instrument change could regress it silently).
  *
  * Inputs are the canary samples in session order; `samples.head` is the
  * session-start baseline taken before any timed measurement.
  */
object BenchCanary {

  def sessionMedian(samples: Seq[Double]): Double = {
    val s = samples.sorted
    if (s.isEmpty) 0.0 else s(s.size / 2)
  }

  /** A run is flagged when either:
    *
    *  - TWO CONSECUTIVE samples exceed `spikeFactor` (1.75x) times the
    *    session median — an external load episode lifts a consecutive
    *    stretch; a single elevated sample is scheduling noise the per-query
    *    medians already tolerate; or
    *  - the session median itself exceeds `plateauFactor` (2.5x) times the
    *    session-start baseline — a load episode spanning half or more of the
    *    run raises the median and would otherwise mask itself (round-5
    *    ADVICE). Ordinary mid-session aging (GC pressure + code cache) is
    *    ~1.5x and stays under this. The baseline is the MEDIAN OF THE FIRST
    *    THREE samples, not the first alone: a clean 164-query run measured
    *    its single cold-start sample at 0.154s against a 0.388s session
    *    median (2.52x) purely because the first sample ran in a
    *    pre-aging JVM — one sample in either direction is not a baseline.
    */
  def loadFlag(
      samples: Seq[Double],
      spikeFactor: Double = 1.75,
      plateauFactor: Double = 2.5): Boolean = {
    if (samples.size < 2) return false
    val median = sessionMedian(samples)
    val spike = samples.sliding(2).exists(w =>
      w.length == 2 && w.forall(_ > median * spikeFactor))
    val baseline = sessionMedian(samples.take(3))
    val plateau = median > baseline * plateauFactor
    spike || plateau
  }
}
