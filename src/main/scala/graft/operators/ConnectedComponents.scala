package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Connected components over an edge list, two interchangeable strategies:
  *
  *  - [[minLabelPropagation]] — one equi-join + partial-agg min per round,
  *    O(diameter) rounds. The right tool for LSH near-dup graphs, whose
  *    components are bucket cliques of diameter ~2-3 (p18's default).
  *  - [[largeSmallStar]] — alternating large-star/small-star rounds
  *    (Kiveris et al. 2014, "Connected Components in MapReduce and
  *    Beyond"), O(log² n) rounds regardless of diameter. The robustness
  *    tier for adversarial long-chain graphs (transitive similarity
  *    chains, citation/link graphs) where propagation would need
  *    diameter(G) shuffles.
  *
  * Both take `edges(src, dst)` (undirected; either orientation) and return
  * `(node, component)` where component is the minimum node id reachable —
  * the canonical representative a dedup pass keeps. Each round
  * localCheckpoints so lineage stays constant-size, and every convergence
  * check is a scalar aggregate, never a row collect.
  */
object ConnectedComponents {

  /** Min-label propagation (p18's original body, factored for reuse). */
  def minLabelPropagation(edgesIn: DataFrame, maxRounds: Int = 25): DataFrame = {
    // Both orientations in one explode pass: a union of two projections of
    // `edgesIn` would execute the (possibly expensive, un-checkpointed)
    // upstream lineage once per branch — for the LSH pair graph that is a
    // second full minhash pipeline.
    val edges = edgesIn
      .select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint()
    // r18 OPTIMIZATION (guide §1.2): fuse round 1 into initialization —
    // labels start at min(node, min direct neighbor), which is exactly the
    // state the old comp=node init reached after its first propagation
    // round, for the same shuffle the old distinct() paid. One full round
    // (join + agg + checkpoint + convergence count) disappears from every
    // component query; the fixed point is unchanged (same monotone map,
    // same lattice), pinned by ConnectedComponentsSpec.
    var labels = edges.groupBy(col("src").as("node"))
      .agg(min(col("dst")).as("nmin"))
      .select(col("node"), least(col("node"), col("nmin")).as("comp"))
      .localCheckpoint()
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxRounds) {
      val nbrMin = edges.join(labels, col("dst") === col("node"))
        .groupBy(col("src").as("n2")).agg(min(col("comp")).as("nmin"))
      val stepped = labels.join(nbrMin, col("node") === col("n2"), "left")
        .select(col("node"), col("comp"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp2"))
        .localCheckpoint()
      changed = stepped.filter(col("comp2") =!= col("comp")).count()
      labels = stepped.select(col("node"), col("comp2").as("comp"))
      rounds += 1
    }
    labels
  }

  /** One large-star round: every node u links each LARGER neighbor to the
    * minimum of its neighborhood (min(N(u) ∪ {u})) — long chains halve
    * toward their minimum in parallel. Window over the node key, never a
    * self-join; per-group state is one running min. */
  private def largeStar(edges: DataFrame): DataFrame = {
    // Both orientations in ONE pass (explode, not union — a union of two
    // projections re-executes the child lineage per branch, the q87
    // double-lineage class). No trailing distinct: the consumer is
    // smallStar's min-window, which duplicates can't perturb; the round's
    // single distinct lives at smallStar's tail.
    val nbrs = edges
      .select(explode(array(
        struct(col("u"), col("v")),
        struct(col("v").as("u"), col("u").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    val m = least(col("u"), min(col("v")).over(Window.partitionBy(col("u"))))
    nbrs.withColumn("m", m)
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
  }

  /** One small-star round: per node, all SMALLER neighbors (and the node
    * itself) link to the smallest of them — stars flatten to depth one. */
  private def smallStar(edges: DataFrame): DataFrame = {
    val canon = edges.select(
      greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
    val w = Window.partitionBy(col("u"))
    val withMin = canon.withColumn("m", min(col("v")).over(w))
    // Emit (v→m) and (u→m) from one pass of the window output (explode, not
    // union — see largeStar). This distinct is the round pair's only one.
    withMin
      .select(explode(array(
        struct(col("v").as("u"), col("m").as("v")),
        struct(col("u"), col("m").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Alternating large-star/small-star to a fixed point. Returns the
    * labels and the number of rounds taken (spec-asserted to beat
    * O(diameter) on long chains). */
  def largeSmallStarWithRounds(edgesIn: DataFrame, maxRounds: Int = 40): (DataFrame, Int) = {
    // ONE execution of the upstream lineage: `base` is checkpointed first,
    // and nodes/cur both derive from it. The previous spelling (nodes as a
    // union of two projections + cur from edgesIn) re-ran the un-checkpointed
    // input pipeline three times before the first round started.
    val base = edgesIn
      .select(col("src").as("u"), col("dst").as("v"))
      .localCheckpoint()
    val nodes = base
      .select(explode(array(col("u"), col("v"))).as("node"))
      .distinct()
    var cur = base
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    var rounds = 0
    var converged = false
    // Convergence in two tiers: a CHEAP per-round fingerprint — one scalar
    // aggregate computing (count, bit_xor of xxhash64) over the edge set
    // (xor: order-independent, overflow-free under ANSI, and the sets are
    // distinct so self-cancellation can't occur) — detects candidate fixed
    // points; only then does the DETERMINISTIC set check (except over
    // distinct sets) confirm, so a 64-bit fingerprint collision can stall
    // nothing and the expensive anti-join runs ~once per graph instead of
    // every round.
    def fingerprint(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var curFp = fingerprint(cur)
    while (!converged && rounds < maxRounds) {
      val next = smallStar(largeStar(cur)).localCheckpoint()
      val nextFp = fingerprint(next)
      converged = nextFp == curFp && next.except(cur).isEmpty
      cur = next
      curFp = nextFp
      rounds += 1
    }
    // At the fixed point every edge is (node, root): star graphs rooted at
    // the component minimum. Roots appear only on the v side.
    val comp = cur.groupBy(col("u").as("node")).agg(min(col("v")).as("comp"))
    val roots = nodes.join(comp, Seq("node"), "left_anti")
      .select(col("node"), col("node").as("comp"))
    (comp.unionByName(roots), rounds)
  }

  def largeSmallStar(edgesIn: DataFrame, maxRounds: Int = 40): DataFrame =
    largeSmallStarWithRounds(edgesIn, maxRounds)._1
}
