package graft.functions

import graft.SparkTestBase
import graft.functions.expressions.CosineSimilarity
import graft.operators.BruteForceCosine
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private def naiveCosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("cosine_sim is bit-identical to the naive ascending fold, via Column API and SQL") {
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(50)((Array.fill(64)(rng.nextDouble() * 2 - 1),
      Array.fill(64)(rng.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val viaCol = df.select(CosineSimilarity.cosineSim(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    val expected = rows.map { case (a, b) => naiveCosine(a, b) }
    viaCol.zip(expected).foreach { case (got, want) =>
      assert(got == want, "must be bit-identical, not just approximately equal")
    }

    CosineSimilarity.register(spark)
    val viaSql = df.select(expr("cosine_sim(a, b)")).collect().map(_.getDouble(0))
    assert(viaSql.toSeq == viaCol.toSeq)
  }

  test("cosine_sim stays inside whole-stage codegen and is null-safe") {
    CosineSimilarity.register(spark)
    val big = spark.range(100)
      .select(array(col("id").cast("double"), lit(1.0)).as("a"),
        array(lit(1.0), col("id").cast("double")).as("b"))
      .select(expr("cosine_sim(a, b)").as("sim"))
    val plan = big.queryExecution.executedPlan.toString()
    assert(plan.contains("*(1) Project [cosine_sim"),
      s"expression must sit inside a codegen stage (the *(n) marker): $plan")
    assert(big.agg(max(col("sim"))).collect()(0).getDouble(0) <= 1.0)

    val withNull = Seq((Some(Array(1.0, 0.0)), Some(Array(1.0, 0.0))),
      (None, Some(Array(1.0, 0.0)))).toDF("a", "b")
    val out = withNull.select(expr("cosine_sim(a, b)")).collect()
    assert(out(0).getDouble(0) == 1.0 && out(1).isNullAt(0))
  }

  test("BruteForceCosine builds broadcast joins with no driver-side collect of the corpus") {
    val rng = new scala.util.Random(11)
    val df = (0L until 40L).map(id => (id, Array.fill(16)(rng.nextDouble() * 2 - 1)))
      .toDF("vec_id", "embedding")

    val pairs = BruteForceCosine.pairsAbove(df, "vec_id", "embedding", 0.2)
    val pairPlan = pairs.queryExecution.executedPlan.toString()
    assert(pairPlan.contains("BroadcastNestedLoopJoin"),
      s"pairsAbove must plan as a broadcast join, not a driver collect: $pairPlan")

    // ground truth from a local brute force over the same vectors
    val vecs = df.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val truth = (for {
      i <- vecs.keys.toSeq.sorted; j <- vecs.keys.toSeq.sorted if i < j
      s = naiveCosine(vecs(i), vecs(j)) if s >= 0.2
    } yield (i, j) -> s).toMap
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == truth, "broadcast-join pairsAbove must match local brute force bit-for-bit")

    // blocked variant: same pairs bit-for-bit via an equi-join on tile keys.
    // With auto-broadcast off (what a 100 TB input looks like to the
    // planner) the plan must still be a pure shuffle join — the operator
    // never REQUIRES a broadcastable side, unlike pairsAbove.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val gotBlocked = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val blocked = BruteForceCosine.pairsAboveBlocked(df, "vec_id", "embedding", 0.2, nBlocks = 4)
      val blockedPlan = blocked.queryExecution.executedPlan.toString()
      assert(!blockedPlan.contains("BroadcastNestedLoopJoin") &&
        !blockedPlan.contains("BroadcastHashJoin"),
        s"blocked all-pairs must survive without a broadcastable side: $blockedPlan")
      blocked.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    assert(gotBlocked == truth, "tiled join must reproduce broadcast results bit-for-bit")
    // nBlocks=1 degenerates to a single tile and still matches
    val oneTile = BruteForceCosine.pairsAboveBlocked(df, "vec_id", "embedding", 0.2, nBlocks = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(oneTile == truth)

    // property sweep: every tiling must cover each unordered pair exactly
    // once — sweep block counts (incl. nBlocks > distinct hash-blocks) over
    // corpora with gappy, non-contiguous ids
    for ((n, blocks, seed) <- Seq((17, 3, 23), (33, 7, 29), (12, 9, 31))) {
      val rng2 = new scala.util.Random(seed)
      val df2 = (0 until n).map(_ => rng2.nextLong().abs % 1000L).distinct
        .map(id => (id, Array.fill(8)(rng2.nextDouble() * 2 - 1)))
        .toDF("vec_id", "embedding")
      val want = BruteForceCosine.pairsAbove(df2, "vec_id", "embedding", -1.0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val got = BruteForceCosine.pairsAboveBlocked(df2, "vec_id", "embedding", -1.0, blocks)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(got == want,
        s"n=$n nBlocks=$blocks: tiling lost or duplicated pairs (${got.size} vs ${want.size})")
    }

    val topk = BruteForceCosine.topK(df, "vec_id", "embedding", col("vec_id") < 3, k = 4)
    val topkPlan = topk.queryExecution.executedPlan.toString()
    assert(topkPlan.contains("BroadcastNestedLoopJoin"),
      s"topK must broadcast the query side: $topkPlan")
    val gotTop = topk.collect()
      .map(r => (r.getLong(0), r.getInt(3).toLong) -> r.getLong(1)).toMap
    val truthTop = (for (q <- 0L until 3L) yield {
      val ranked = vecs.keys.toSeq.filter(_ != q)
        .map(n => (n, naiveCosine(vecs(q), vecs(n))))
        .sortBy { case (n, s) => (-s, n) }.take(4)
      ranked.zipWithIndex.map { case ((n, _), i) => (q, i + 1L) -> n }
    }).flatten.toMap
    assert(gotTop == truthTop)
  }
}
