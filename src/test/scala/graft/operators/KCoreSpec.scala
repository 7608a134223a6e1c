package graft.operators

import graft.SparkTestBase

class KCoreSpec extends SparkTestBase {
  import spark.implicits._

  private def coreness(edges: Seq[(Long, Long)]): Map[Long, Long] =
    KCore.decompose(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap

  test("clique, triangle, and path decompose to known coreness") {
    // K4 on 1-4 (coreness 3), triangle 5-6-7 (coreness 2), path 8-9-10
    // (coreness 1), all disjoint
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (6L, 7L), (5L, 7L),
      (8L, 9L), (9L, 10L))
    val got = coreness(edges)
    assert(got == Map(
      1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      5L -> 2L, 6L -> 2L, 7L -> 2L,
      8L -> 1L, 9L -> 1L, 10L -> 1L))
  }

  test("tree fringe peels below the dense center") {
    // triangle 1-2-3 with pendant 4 hanging off node 1
    val got = coreness(Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)))
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("ring is uniformly 2-core; direction and duplicates don't matter") {
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L))
    val noisy = ring ++ ring.map(_.swap) ++ Seq((1L, 1L)) // dup + self-loop
    assert(coreness(noisy) == (1L to 5L).map(_ -> 2L).toMap)
  }

  test("empty edge set returns an empty frame without spinning") {
    val out = KCore.decompose(Seq.empty[(Long, Long)].toDF("a", "b"))
    assert(out.columns.toSeq == Seq("node", "coreness"))
    assert(out.count() == 0)
  }
}
