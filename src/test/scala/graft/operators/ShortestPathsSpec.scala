package graft.operators

import graft.SparkTestBase

/** BFS hop counts: exact distances on a known graph, cycle safety, the
  * depth cap, unreachable-node exclusion, and the isolated-source edge
  * case (mirrors the convergence contract of the q115 oracle's
  * depth-capped recursive CTE).
  */
class ShortestPathsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], source: Long, maxHops: Int): Map[Long, Long] =
    ShortestPaths.hops(edges.toDF("src", "dst"), source, maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("exact hop counts on a diamond with a shortcut") {
    //   1 -> 2 -> 4 -> 5,  1 -> 3 -> 5  (5 reachable in 2 via 3)
    val d = run(Seq((1L, 2L), (2L, 4L), (4L, 5L), (1L, 3L), (3L, 5L)), 1L, 10)
    assert(d === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L))
  }

  test("cycles terminate and keep shortest distances") {
    val d = run(Seq((1L, 2L), (2L, 3L), (3L, 1L)), 1L, 10)
    assert(d === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("maxHops caps exploration depth") {
    val chain = (1L to 6L).sliding(2).map(p => (p(0), p(1))).toSeq
    val d = run(chain, 1L, 2)
    assert(d === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("unreachable nodes are absent; isolated source yields itself") {
    val d = run(Seq((2L, 3L)), 1L, 10)
    assert(d === Map(1L -> 0L))
  }

  test("converges early: hop distances stop changing before maxHops") {
    // path of length 3, generous cap — result identical to the exact BFS
    val d = run(Seq((1L, 2L), (2L, 3L), (3L, 4L)), 1L, 100)
    assert(d === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("driver tail ≡ distributed relaxation on a random digraph") {
    val rnd = new scala.util.Random(13)
    val edges = (0 until 120).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val df = edges.toDF("src", "dst")
    val viaDriver = ShortestPaths.hops(df, source = 0L, maxHops = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaLoop = ShortestPaths.hops(df, source = 0L, maxHops = 7, driverMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver == viaLoop)
  }
}
