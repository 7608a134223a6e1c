package graft.operators

import graft.SparkTestBase

class ConnectedComponentsSpec extends SparkTestBase {
  import spark.implicits._

  test("components merge chains and cliques; isolated-by-edges nodes keep smallest id") {
    // components: {1,2,3,4} (chain), {10,11} (pair), {20,21,22} (triangle)
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)
    ).toDF("a", "b")
    val cc = ConnectedComponents.run(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(cc(_) == 1L))
    assert(Seq(10L, 11L).forall(cc(_) == 10L))
    assert(Seq(20L, 21L, 22L).forall(cc(_) == 20L))
  }

  test("empty edge set returns an empty result instead of spinning to maxIter") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val cc = ConnectedComponents.run(empty, maxIter = 3)
    assert(cc.columns.toSeq == Seq("node", "component"))
    assert(cc.count() == 0L)
  }

  test("long chain converges within the diameter bound (distributed loop forced)") {
    val n = 16
    val pairs = (0 until n - 1).map(i => (i.toLong + 1, i.toLong)).toDF("a", "b")
    val cc = ConnectedComponents.run(pairs, maxIter = 20, driverMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0 until n).forall(i => cc(i.toLong) == 0L), cc.toString)
  }

  test("driver union-find tail ≡ distributed min-label loop on a mixed graph") {
    // chains, cliques, a star, and an isolated pair — plus ids far apart so
    // min-selection is exercised across unions in both directions
    val rnd = new scala.util.Random(7)
    val edges = (0 until 40).map(i => (i.toLong, i.toLong + 1)) ++ // long chain
      Seq((100L, 107L), (107L, 103L), (103L, 100L)) ++            // triangle
      (1 to 8).map(i => (200L + i, 200L)) ++                      // star on 200
      Seq((999L, 998L)) ++
      (0 until 30).map(_ => { val a = rnd.nextInt(50).toLong; (a, a + rnd.nextInt(5) + 1) })
    val pairs = edges.toDF("a", "b")
    val viaDriver = ConnectedComponents.run(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaLoop = ConnectedComponents.run(pairs, maxIter = 60, driverMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver == viaLoop)
  }

  test("reliable checkpointing: same result with a durable checkpoint dir; loud without one") {
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty)
    // forcing reliable mode without a checkpoint dir must fail fast, not at job end
    val pairs = Seq((2L, 1L), (3L, 2L), (10L, 11L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      ConnectedComponents.run(pairs, reliable = Some(true), driverMaxEdges = 0L)
    }
    val dir = java.nio.file.Files.createTempDirectory("cc-ckpt").toString
    sc.setCheckpointDir(dir)
    try {
      // autodetected reliable mode (checkpoint dir now set) matches local
      // mode; the loop is forced — the driver tail would collect this tiny
      // graph and delete the run dir before the assertions below see it
      val cc = ConnectedComponents.run(pairs, driverMaxEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
      // setCheckpointDir nests a session uuid dir; our run dirs live inside it
      val runDirs = new java.io.File(sc.getCheckpointDir.get.stripPrefix("file:"))
        .listFiles().filter(_.getName.startsWith("graft-cc-"))
      assert(runDirs.nonEmpty, "reliable mode must actually write checkpoint data")
      // superseded iterations are deleted as the loop advances: at most the
      // edges table + the final (returned) labels table remain on disk
      val cuts = runDirs.head.listFiles().filter(_.getName.startsWith("cut-"))
      assert(cuts.length <= 2,
        s"superseded iteration cuts must be deleted, found: ${cuts.map(_.getName).mkString(",")}")
      val local = ConnectedComponents.run(pairs, reliable = Some(false), driverMaxEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local == cc)
    } finally sc.setCheckpointDir(null)
  }

  test("dedup clusters from MinHash candidates pick one survivor per cluster") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),  // near-dup of 1
      (3L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup of 1
      (4L, "completely unrelated text with different words entirely here")
    ).toDF("doc_id", "text")
    val pairs = graft.functions.MinHash.candidatePairs(
      docs, "doc_id", "text", numHashes = 32, bands = 8, shingleSize = 3,
      minEstSim = 0.3).select("d1", "d2")
    val cc = ConnectedComponents.run(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1,2,3 form one cluster with survivor 1; 4 never appears (no pairs)
    assert(cc.get(1L).contains(1L) && cc.get(3L).contains(1L))
    assert(cc.get(2L).forall(_ == 1L)) // present iff the near-dup pair surfaced
    assert(!cc.contains(4L))
  }
}
