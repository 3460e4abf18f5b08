package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.operators.ConnectedComponents

/** Both component strategies must agree everywhere; the star rounds must
  * beat O(diameter) on the adversarial long-chain graph that min-label
  * propagation is worst at (round-4 ADVICE item). */
class ConnectedComponentsSpec extends AnyFunSuite {
  private val spark = SharedSpark.spark
  import spark.implicits._

  private def labelsOf(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def edges(pairs: Seq[(Long, Long)]): DataFrame =
    pairs.toDF("src", "dst")

  test("long chain (diameter 200): star rounds converge in O(log^2 n), result exact") {
    // path graph 1000-1001-...-1200 — diameter 200; propagation needs ~200
    // rounds (capped far below that), star rounds need ~log^2
    val chain = (1000L until 1200L).map(i => (i, i + 1))
    val (labels, rounds) = ConnectedComponents.largeSmallStarWithRounds(edges(chain))
    val got = labelsOf(labels)
    assert(got.size == 201)
    assert(got.values.forall(_ == 1000L), s"every node must resolve to the chain min")
    assert(rounds <= 15, s"star rounds must be O(log^2 n), took $rounds")
  }

  test("mixed graph: chains + cliques + isolated pair — strategies agree") {
    val g = (0L until 50L).map(i => (i, i + 1)) ++ // chain 0..50
      Seq((100L, 101L), (101L, 102L), (100L, 102L)) ++ // triangle
      Seq((200L, 201L)) ++ // pair
      (300L until 305L).flatMap(i => (i + 1 to 305L).map(j => (i, j))) // clique
    val star = labelsOf(ConnectedComponents.largeSmallStar(edges(g)))
    // propagation needs diameter rounds — 51 for the chain (the very cost
    // the star variant exists to avoid; its default 25-round cap is sized
    // for LSH clique graphs)
    val prop = labelsOf(ConnectedComponents.minLabelPropagation(edges(g), maxRounds = 60)
      .select($"node", $"comp"))
    assert(star == prop)
    assert(star(25L) == 0L && star(102L) == 100L && star(201L) == 200L && star(305L) == 300L)
  }

  test("edge orientation and duplicates don't matter") {
    val g = Seq((5L, 3L), (3L, 5L), (5L, 3L), (1L, 3L))
    val star = labelsOf(ConnectedComponents.largeSmallStar(edges(g)))
    assert(star == Map(1L -> 1L, 3L -> 1L, 5L -> 1L))
  }
}
