package graft.tools

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Cross-cut bench adjudication, automated (round-14 VERDICT next-round #2).
  *
  * Every round BENCH_NOTES hand-derives the same three numbers to compare
  * two bench artifacts whose coverage and machine temperature differ:
  * common-coverage totals (median and min basis), canary-normalized deltas
  * (seconds of suite per second of canary — the established ±2% ambient
  * envelope), and a cb section verdict normalized by the cb-section-local
  * canary (the cb total tracks that canary; raw cb totals swing ±10%
  * between same-day cuts). This tool derives all of them mechanically from
  * the artifacts and prints a paste-ready markdown block, so round-over-
  * round claims stop depending on hand math.
  *
  * Usage: runMain graft.tools.BenchDiff <baseline.json> <candidate.json>
  * Reads the `bench_full.json` shape (queries/clickbench sections with
  * median+min per query, canary_median, cb_canary_median). Older artifacts
  * without cb_canary_median fall back to the session canary for the cb
  * verdict and say so. Dev tool — not part of the shipped library surface.
  */
object BenchDiff {

  private val mapper = new ObjectMapper()

  private case class Cut(
      path: String,
      queries: Map[String, (Double, Double)], // name -> (median, min)
      cb: Map[String, (Double, Double)],
      canary: Option[Double],
      cbCanary: Option[Double],
      official: Boolean)

  private def section(root: JsonNode, field: String): Map[String, (Double, Double)] = {
    val node = root.path(field)
    if (!node.isObject) Map.empty
    else node.fields.asScala.map { e =>
      val v = e.getValue
      // current shape: {"median":..,"min":..}; very old artifacts held a bare number
      if (v.isObject) {
        // fail loudly on a malformed entry — path().asDouble would coerce a
        // missing median to 0.0 and silently zero the totals (r15 ADVICE)
        require(v.has("median"), s"$field: ${e.getKey} lacks median")
        e.getKey -> (v.path("median").asDouble,
          if (v.has("min")) v.path("min").asDouble else v.path("median").asDouble)
      } else e.getKey -> (v.asDouble, v.asDouble)
    }.toMap
  }

  private def load(path: String): Cut = {
    val root = mapper.readTree(new java.io.File(path))
    def opt(f: String): Option[Double] =
      if (root.has(f) && root.path(f).isNumber) Some(root.path(f).asDouble) else None
    Cut(path, section(root, "queries"), section(root, "clickbench"),
      opt("canary_median"), opt("cb_canary_median"),
      root.path("official").asBoolean(false))
  }

  private def total(m: Map[String, (Double, Double)], keys: Set[String],
      min: Boolean): Double =
    keys.toSeq.map(k => if (min) m(k)._2 else m(k)._1).sum

  private def pct(a: Double, b: Double): Double =
    if (a == 0) 0 else (b - a) / a * 100

  private def f(x: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, x)
  private def fp(x: Double): String = "%+.1f%%".formatLocal(java.util.Locale.ROOT, x)

  /** Verdict on a canary-normalized delta: the ambient envelope observed
    * since round 10 is ±2% in suite-seconds-per-canary-second units. */
  private def verdict(normPct: Double): String =
    if (normPct <= -2.0) "IMPROVED"
    else if (normPct >= 2.0) "REGRESSED"
    else "FLAT (within the ±2% canary-normalized envelope)"

  def render(aPath: String, bPath: String): String =
    renderCuts(load(aPath), load(bPath))

  private def renderCuts(a: Cut, b: Cut): String = {
    val sb = new StringBuilder
    def line(s: String = ""): Unit = { sb.append(s); sb.append('\n') }

    val qk = a.queries.keySet & b.queries.keySet
    val ck = a.cb.keySet & b.cb.keySet
    line(s"### BenchDiff: ${a.path} -> ${b.path}")
    line()
    line(s"- coverage: baseline ${a.queries.size}+${a.cb.size}cb" +
      s" (official=${a.official}), candidate ${b.queries.size}+${b.cb.size}cb" +
      s" (official=${b.official}); common ${qk.size}+${ck.size}cb")
    val onlyB = (b.queries.keySet -- a.queries.keySet).toSeq.sorted
    if (onlyB.nonEmpty)
      line(s"- candidate-only queries (excluded from totals): " +
        s"${onlyB.take(8).mkString(", ")}${if (onlyB.size > 8) s" ... (${onlyB.size})" else ""}")

    // ---- main section, common coverage
    val (amed, bmed) = (total(a.queries, qk, min = false), total(b.queries, qk, min = false))
    val (amin, bmin) = (total(a.queries, qk, min = true), total(b.queries, qk, min = true))
    line()
    line(s"| basis | baseline | candidate | delta |")
    line(s"|---|---|---|---|")
    line(s"| non-cb median (common) | ${f(amed)} s | ${f(bmed)} s | ${fp(pct(amed, bmed))} |")
    line(s"| non-cb min (common) | ${f(amin)} s | ${f(bmin)} s | ${fp(pct(amin, bmin))} |")

    // ---- canary normalization
    (a.canary, b.canary) match {
      case (Some(ca), Some(cb)) =>
        val na = amed / ca; val nb = bmed / cb
        val np = pct(na, nb)
        line(s"| canary median | ${f(ca)} s | ${f(cb)} s | ${fp(pct(ca, cb))} |")
        line(s"| suite-s per canary-s | ${f(na)} | ${f(nb)} | ${fp(np)} |")
        line()
        line(s"- **non-cb verdict: ${verdict(np)}** (raw ${fp(pct(amed, bmed))}, " +
          s"canary-normalized ${fp(np)}; min-basis raw ${fp(pct(amin, bmin))})")
      case _ =>
        line()
        line(s"- non-cb verdict: raw-only ${fp(pct(amed, bmed))} " +
          s"(canary missing in ${if (a.canary.isEmpty) a.path else b.path})")
    }

    // ---- cb section, normalized by the cb-local canary when present
    if (ck.nonEmpty) {
      val (cmedA, cmedB) = (total(a.cb, ck, min = false), total(b.cb, ck, min = false))
      val (cminA, cminB) = (total(a.cb, ck, min = true), total(b.cb, ck, min = true))
      val (canA, canB) = (a.cbCanary.orElse(a.canary), b.cbCanary.orElse(b.canary))
      val fallback = a.cbCanary.isEmpty || b.cbCanary.isEmpty
      line()
      line(s"| cb basis | baseline | candidate | delta |")
      line(s"|---|---|---|---|")
      line(s"| cb median (common) | ${f(cmedA)} s | ${f(cmedB)} s | ${fp(pct(cmedA, cmedB))} |")
      line(s"| cb min (common) | ${f(cminA)} s | ${f(cminB)} s | ${fp(pct(cminA, cminB))} |")
      (canA, canB) match {
        case (Some(x), Some(y)) =>
          val np = pct(cmedA / x, cmedB / y)
          line(s"| cb canary | ${f(x)} s | ${f(y)} s | ${fp(pct(x, y))} |")
          line()
          line(s"- **cb verdict: ${verdict(np)}** (raw ${fp(pct(cmedA, cmedB))}, " +
            s"cb-canary-normalized ${fp(np)}, min-basis ${fp(pct(cminA, cminB))}" +
            s"${if (fallback) "; session-canary fallback: artifact predates cb_canary_median" else ""})")
        case _ =>
          line()
          line(s"- cb verdict: raw-only ${fp(pct(cmedA, cmedB))} (no canary)")
      }
    }

    // ---- top movers on the median basis, ambient-flagged via min basis
    val movers = qk.toSeq.map { k =>
      val (ma, _) = a.queries(k); val (mb, _) = b.queries(k)
      val (na, nb) = (a.queries(k)._2, b.queries(k)._2)
      (k, ma, mb, mb - ma, if (na > 0) nb / na else 1.0)
    }.sortBy { case (_, _, _, d, _) => -math.abs(d) }.take(12)
    line()
    line(s"| top movers (median) | baseline | candidate | delta | min-ratio | read |")
    line(s"|---|---|---|---|---|---|")
    movers.foreach { case (k, ma, mb, d, minR) =>
      // a median move the min basis does not corroborate is ambient noise —
      // in BOTH directions (r15 ADVICE: improvements used to be labeled
      // 'faster' unconditionally, so ambient noise in the improving
      // direction read as a real win)
      val medR = if (ma > 0) mb / ma else 1.0
      val read =
        if (d < 0 && medR < 0.87 && minR >= 0.9) "ambient (min flat)"
        else if (d < 0) "faster"
        else if (medR > 1.15 && minR <= 1.1) "ambient (min flat)"
        else "slower"
      line(s"| $k | ${f(ma)} | ${f(mb)} | ${fp(pct(ma, mb))} | " +
        s"${"%.2f".formatLocal(java.util.Locale.ROOT, minR)} | $read |")
    }
    sb.toString
  }

  // ---- N-cut series mode (round-15 VERDICT #5) --------------------------
  //
  // Same-day cuts heat monotonically (r15: cb 10.26 -> 11.40 -> 13.51 s
  // across three cuts), so pairwise comparisons against DIFFERENT cuts of
  // the same round yield different verdicts. The series mode takes every
  // cut of each round and adjudicates ONE verdict on the min-across-cuts
  // basis: for each query, the minimum median (and minimum min) observed
  // across that round's cuts — the coolest state each side was actually
  // measured in — normalized by each side's coolest canary. Heat inflates
  // medians upward only, so the per-cut minimum converges on the unheated
  // value as cuts are added, making cut selection mechanical instead of
  // an argument about which cut was fairest.

  /** Element-wise min across the cuts' query maps, on the intersection of
    * their coverage (a query absent from one cut would otherwise read as
    * an artificial win for the side that timed it cold). */
  private def minAcross(maps: Seq[Map[String, (Double, Double)]])
      : Map[String, (Double, Double)] = {
    val keys = maps.map(_.keySet).reduce(_ & _)
    require(keys.nonEmpty || maps.forall(_.isEmpty),
      "min-across intersection is empty while at least one cut has queries " +
        "in this section — the series verdict would be vacuous (r16 ADVICE)")
    keys.iterator.map { k =>
      k -> ((maps.map(_(k)._1).min, maps.map(_(k)._2).min))
    }.toMap
  }

  private def coolest(cuts: Seq[Cut], label: String): Cut =
    Cut(s"$label[min of ${cuts.size}: ${cuts.map(_.path).mkString(", ")}]",
      minAcross(cuts.map(_.queries)), minAcross(cuts.map(_.cb)),
      Some(cuts.flatMap(_.canary)).filter(_.nonEmpty).map(_.min),
      Some(cuts.flatMap(_.cbCanary)).filter(_.nonEmpty).map(_.min),
      cuts.exists(_.official))

  /** Series-input guard (r16 ADVICE): a cb-only (or otherwise
    * section-empty) cut included in --series would silently empty the
    * intersection minAcross takes and yield a vacuous FLAT verdict with
    * zero totals. Mixed empty/non-empty sections fail loudly naming the
    * offending cut; partial-coverage intersections are reported as a
    * dropped-query note in the rendered output. */
  private def seriesCoverageNote(side: String, cuts: Seq[Cut]): String = {
    def check(section: String, maps: Seq[(String, Map[String, (Double, Double)])]): String = {
      val (empty, nonEmpty) = maps.partition(_._2.isEmpty)
      require(empty.isEmpty || nonEmpty.isEmpty,
        s"$side $section section: cut(s) ${empty.map(_._1).mkString(", ")} carry " +
          s"no $section queries while ${nonEmpty.map(_._1).mkString(", ")} do — a " +
          s"partial cut in a series empties the min-across intersection and the " +
          s"verdict would be vacuous; drop it or diff it pairwise")
      if (nonEmpty.isEmpty) ""
      else {
        val union = nonEmpty.map(_._2.keySet).reduce(_ | _)
        val inter = nonEmpty.map(_._2.keySet).reduce(_ & _)
        val dropped = union.size - inter.size
        if (dropped == 0) ""
        else s"- $side $section: $dropped of ${union.size} queries dropped by " +
          s"the coverage intersection (e.g. ${(union -- inter).toSeq.sorted.take(5).mkString(", ")})\n"
      }
    }
    check("non-cb", cuts.map(c => c.path -> c.queries)) +
      check("cb", cuts.map(c => c.path -> c.cb))
  }

  def renderSeries(basePaths: Seq[String], candPaths: Seq[String]): String = {
    val bases = basePaths.map(load)
    val cands = candPaths.map(load)
    val sb = new StringBuilder
    sb.append(s"### BenchDiff series: ${bases.size} baseline cut(s) vs " +
      s"${cands.size} candidate cut(s)\n\n")
    val coverageNotes = seriesCoverageNote("baseline", bases) +
      seriesCoverageNote("candidate", cands)
    if (coverageNotes.nonEmpty) { sb.append(coverageNotes); sb.append('\n') }
    sb.append("| side | cut | non-cb total | cb total | canary | cb canary |\n")
    sb.append("|---|---|---|---|---|---|\n")
    def row(side: String, c: Cut): Unit = {
      val t = c.queries.values.map(_._1).sum
      val ct = c.cb.values.map(_._1).sum
      sb.append(s"| $side | ${c.path} | ${f(t)} s | ${f(ct)} s | " +
        s"${c.canary.map(f).getOrElse("-")} | ${c.cbCanary.map(f).getOrElse("-")} |\n")
    }
    bases.foreach(row("base", _))
    cands.foreach(row("cand", _))
    sb.append("\n")
    sb.append(renderCuts(coolest(bases, "baseline"), coolest(cands, "candidate")))
    sb.append("\n(series verdict basis: per-query min across each side's " +
      "cuts, normalized by each side's coolest canary — heat only inflates, " +
      "so the minimum is the best estimate of the unheated value)\n")
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--series")) {
      // usage: BenchDiff --series <base1> [base2 ...] --vs <cand1> [...] [out.md]
      val rest = args.drop(1)
      val vs = rest.indexOf("--vs")
      require(vs > 0 && vs < rest.length - 1,
        "usage: BenchDiff --series <base...> --vs <cand...> [out.md]")
      val (basePaths, tail) = (rest.take(vs).toSeq, rest.drop(vs + 1).toSeq)
      val (candPaths, out) =
        if (tail.last.endsWith(".md")) (tail.dropRight(1), Some(tail.last))
        else (tail, None)
      val md = renderSeries(basePaths, candPaths)
      print(md)
      out.foreach(p =>
        java.nio.file.Files.write(java.nio.file.Paths.get(p), md.getBytes("UTF-8")))
    } else {
      require(args.length >= 2,
        "usage: BenchDiff <baseline.json> <candidate.json> [out.md] | --series ...")
      val md = render(args(0), args(1))
      print(md)
      // sbt's log prefix mangles blank lines; an explicit out path keeps the
      // markdown paste-ready
      args.lift(2).foreach(p =>
        java.nio.file.Files.write(java.nio.file.Paths.get(p), md.getBytes("UTF-8")))
    }
  }
}
