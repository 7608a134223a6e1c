package graft.operators

import graft.SparkTestBase

class KCoreSpec extends SparkTestBase {
  import spark.implicits._

  private def coreness(edges: Seq[(Long, Long)],
      driverMaxEdges: Long = KCore.DefaultDriverMaxEdges): Map[Long, Long] =
    KCore.decompose(edges.toDF("a", "b"), driverMaxEdges = driverMaxEdges)
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

  test("driver tail == all-distributed peel on every fixture") {
    val fixtures = Seq(
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
        (5L, 6L), (6L, 7L), (5L, 7L), (8L, 9L), (9L, 10L)),
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)),
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L)))
    fixtures.foreach { edges =>
      assert(coreness(edges) == coreness(edges, driverMaxEdges = 0L),
        s"driver-tail result diverged on $edges")
    }
  }

  test("mid-stream switch to the driver tail clamps to the running level") {
    // K4 (coreness 3) + path 8-9-10 (coreness 1): 16 directed edges.
    // threshold 12 forces distributed rounds to peel the path first
    // (k reaches 1) and the tail to finish the K4 with kFloor = 1.
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (8L, 9L), (9L, 10L))
    val expected = Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      8L -> 1L, 9L -> 1L, 10L -> 1L)
    assert(coreness(edges, driverMaxEdges = 12L) == expected)
    assert(coreness(edges, driverMaxEdges = 0L) == expected)
  }

  test("empty edge set returns an empty frame without spinning") {
    val out = KCore.decompose(Seq.empty[(Long, Long)].toDF("a", "b"))
    assert(out.columns.toSeq == Seq("node", "coreness"))
    assert(out.count() == 0)
  }
}
