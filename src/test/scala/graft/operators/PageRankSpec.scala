package graft.operators

import graft.SparkTestBase

class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  test("two-node cycle reaches the symmetric fixpoint") {
    // a <-> b, equal weights: ranks stay at 1_000_000 each minus the
    // deterministic floor-divide leak per iteration
    val edges = Seq((1L, 2L, 1L), (2L, 1L, 1L)).toDF("src", "dst", "w")
    val got = PageRank.runFixedPoint(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === Set(1L, 2L))
    // symmetric graph ⇒ identical ranks
    assert(got(1L) === got(2L))
    // conservation: total mass within the documented ≤1-micro-per-divide leak
    assert(got.values.sum <= 2000000L && got.values.sum > 1999900L)
  }

  test("a pure sink keeps only the base 15% mass; hub feeds it the rest") {
    // 1 -> 2 only: node 1 never receives, node 2 receives everything
    val edges = Seq((1L, 2L, 1L)).toDF("src", "dst", "w")
    val got = PageRank.runFixedPoint(edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node 1: 150000 + 0.85 * 0 = base only
    assert(got(1L) === 150000L)
    // node 2: 150000 + 0.85 * 1_000_000 (node 1's full initial rank)
    assert(got(2L) === 1000000L)
  }

  test("weighted split: contributions divide by out-weight exactly") {
    // 1 -> 2 (w=3), 1 -> 3 (w=1): node 1's rank splits 3:1
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    val got = PageRank.runFixedPoint(edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // contrib(2) = (1e6 * 3) div 4 = 750000 → 150000 + 850000*750000 div 1e6
    assert(got(2L) === 150000L + (850000L * 750000L) / 1000000L)
    // contrib(3) = (1e6 * 1) div 4 = 250000
    assert(got(3L) === 150000L + (850000L * 250000L) / 1000000L)
    assert(got(1L) === 150000L)
  }

  test("driver tail ≡ distributed loop, bit for bit (integer fixed-point)") {
    // a messy weighted digraph: hub, sink, cycle, multi-weight fan-out
    val rnd = new scala.util.Random(11)
    val edges = (Seq((1L, 2L, 2L), (2L, 3L, 1L), (3L, 1L, 5L), (1L, 3L, 1L),
      (4L, 1L, 7L), (5L, 4L, 1L), (2L, 5L, 3L)) ++
      (0 until 40).map(_ => (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong,
        rnd.nextInt(9).toLong + 1))).toDF("src", "dst", "w")
    val viaDriver = PageRank.runFixedPoint(edges, iters = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaLoop = PageRank.runFixedPoint(edges, iters = 6, driverMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver == viaLoop)
  }

  test("rerun is bit-identical (determinism contract)") {
    val edges = Seq((1L, 2L, 2L), (2L, 3L, 1L), (3L, 1L, 5L), (1L, 3L, 1L))
      .toDF("src", "dst", "w")
    val a = PageRank.runFixedPoint(edges, iters = 4).collect().toSeq
    val b = PageRank.runFixedPoint(edges, iters = 4).collect().toSeq
    assert(a.map(_.toString).sorted === b.map(_.toString).sorted)
  }
}
