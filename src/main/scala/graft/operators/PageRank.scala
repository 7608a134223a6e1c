package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank in FIXED-POINT integer arithmetic — ranks are BIGINT
  * millionths, every operation is integer multiply / floor-divide / sum, so
  * the result is bit-identical on any engine (no floating-point reduce-order
  * or libm drift; the same reason q91/q92 use integer-exact math). The
  * price: each floor-divide leaks up to 1 micro of rank mass, so totals sum
  * to slightly under `n · 1_000_000` — deterministic, documented, and
  * irrelevant to ranking.
  *
  * Per iteration (the classic pull formulation):
  *
  *   rank'(v) = 150_000 + (850_000 · Σ_{u→v} (rank(u) · w(u,v)) div outw(u))
  *                         div 1_000_000
  *
  * Scale shape: one shuffle per iteration — edges equi-join ranks on `src`
  * (both hash-partitioned on the node id), partial+final sum on `dst`.
  * Driver state is O(1); nodes/edges stay distributed, so a billion-node
  * domain graph runs the same plan. Lineage is cut with `localCheckpoint`
  * each iteration (plan depth stays O(1)); on a real cluster pass a
  * checkpoint dir and swap for durable cuts as `ConnectedComponents` does.
  *
  * Overflow bound: total rank mass is conserved at ≤ n·10⁶, so a perfect
  * hub can concentrate contrib(v) ≈ n·10⁶ on one node. The binding term is
  * the damping step `850_000 · contrib(v)`, which must stay under 2⁶³:
  * that requires n < ~1.08·10⁷ for hub-dominated graphs (the per-edge
  * `rank(u)·w` term needs the weaker n·w_max < 9·10¹²). Under non-ANSI
  * Spark a Long overflow wraps silently, so graphs past ~10⁷ nodes must
  * compute the damping step in DECIMAL(38,0) (as the ConnectedComponents
  * convergence probe does) — fine for the ≤10⁵-node domain graphs this
  * engine ranks (q103 runs 25 nations).
  */
object PageRank {

  /** Driver-tail bound (the KCore / ConnectedComponents pattern): domain
    * graphs whose prepared edge table fits are iterated in driver arrays —
    * the SAME integer recurrence, so the result is bit-identical to the
    * distributed loop — saving ~2 shuffle jobs per iteration. The
    * distributed plan stays the scale path for graphs past the bound.
    */
  val DefaultDriverMaxEdges: Long = 2000000L

  /** @param edges 3-column DataFrame (src, dst, weight); weights must be
    *              positive integers
    * @param iters number of Jacobi iterations (fixed count — callers pick
    *              the diameter-appropriate budget; rank deltas shrink
    *              geometrically with damping 0.85)
    * @param driverMaxEdges run the iterations in driver memory when the
    *              prepared edge table (already counted to materialize its
    *              cache) has at most this many rows; `0` forces the
    *              distributed loop. Integer fixed-point makes the two paths
    *              bit-identical (pinned in PageRankSpec).
    * @return (node, rank_micros) — every node that appears as src or dst
    */
  def runFixedPoint(edges: DataFrame, iters: Int,
      driverMaxEdges: Long = DefaultDriverMaxEdges): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val Seq(s0, d0, w0) = edges.columns.toSeq
    val e = edges.select(
      col(s0).cast("long").as("src"),
      col(d0).cast("long").as("dst"),
      col(w0).cast("long").as("w"))
      .persist()
    try {
      val nodes = e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node"))).distinct().persist()
      // out-weight is loop-INVARIANT: fold it into the edge table once so
      // the iteration body joins a single prepared relation instead of
      // re-joining outw every pass
      val ew = e.join(
          e.groupBy(col("src")).agg(sum(col("w")).as("ow")), Seq("src"))
        .select(col("src"), col("dst"), col("w"), col("ow"))
        .persist()
      try {
        val m = ew.count() // materialize once; e's cache is released in finally
        if (driverMaxEdges > 0 && m <= driverMaxEdges)
          return driverTail(edges.sparkSession, ew.collect(), iters)
        var ranks = nodes.withColumn("r", lit(1000000L)).localCheckpoint()
        for (_ <- 1 to iters) {
          // one shuffle per iteration: per-edge contributions UNIONed with a
          // zero row per node (so rankless sinks survive), then partial+final
          // sum — no separate left join against the node table
          val contrib = ew
            .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
            .select(col("dst").as("node"), expr("(r * w) div ow").as("c"))
          ranks = nodes.withColumn("c", lit(0L)).unionByName(contrib)
            .groupBy("node").agg(sum(col("c")).as("contrib"))
            .select(col("node"),
              expr("CAST(150000 + (850000 * contrib) div 1000000 AS BIGINT)")
                .as("r"))
            .localCheckpoint()
        }
        // the last localCheckpoint materialized the result — the cached
        // inputs can be released before returning
        ranks.select(col("node"), col("r").as("rank_micros"))
      } finally {
        nodes.unpersist()
        ew.unpersist()
      }
    } finally {
      e.unpersist()
    }
  }

  /** The same integer recurrence over the collected prepared edge list
    * (src, dst, w, ow). Long addition is exact and commutative and `div` on
    * positives is Java `/`, so ranks match the distributed loop bit for
    * bit — there is no float reduce-order to diverge on. Bounded by the
    * caller's `driverMaxEdges` check.
    */
  private def driverTail(spark: org.apache.spark.sql.SparkSession,
      rows: Array[org.apache.spark.sql.Row], iters: Int): DataFrame = {
    val idx = new java.util.HashMap[Long, Integer](rows.length * 2)
    val nodes = new scala.collection.mutable.ArrayBuffer[Long]
    def id(v: Long): Int = {
      val got = idx.get(v)
      if (got != null) got.intValue()
      else { val i = nodes.length; idx.put(v, i); nodes += v; i }
    }
    val m = rows.length
    val eSrc = new Array[Int](m); val eDst = new Array[Int](m)
    val eW = new Array[Long](m); val eOw = new Array[Long](m)
    var i = 0
    while (i < m) {
      val r = rows(i)
      eSrc(i) = id(r.getLong(0)); eDst(i) = id(r.getLong(1))
      eW(i) = r.getLong(2); eOw(i) = r.getLong(3)
      i += 1
    }
    val n = nodes.length
    var r = Array.fill(n)(1000000L)
    var it = 0
    while (it < iters) {
      val contrib = new Array[Long](n)
      i = 0
      while (i < m) {
        contrib(eDst(i)) += r(eSrc(i)) * eW(i) / eOw(i)
        i += 1
      }
      val next = new Array[Long](n)
      i = 0
      while (i < n) { next(i) = 150000L + 850000L * contrib(i) / 1000000L; i += 1 }
      r = next
      it += 1
    }
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("rank_micros",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val out = (0 until n).map(j =>
      org.apache.spark.sql.Row(nodes(j), r(j)): org.apache.spark.sql.Row).asJava
    spark.createDataFrame(out, schema)
  }
}
