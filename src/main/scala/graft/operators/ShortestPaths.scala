package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-source shortest hop counts (unweighted BFS) by iterative frontier
  * relaxation — the traversal primitive behind reachability, influence
  * radius, and dependency-depth queries that SQL alone needs a recursive
  * CTE for.
  *
  * Each iteration is one shuffle: dist' = min(dist, min over in-edges of
  * dist(src) + 1), i.e. Bellman–Ford specialised to unit weights, so after
  * k iterations every node at hop distance <= k carries its exact BFS
  * distance. `maxHops` bounds the loop (and the result: nodes farther than
  * `maxHops` are absent, matching a depth-capped recursive CTE with the
  * same bound). Convergence is detected by comparing reached-node count and
  * exact distance sum (both monotone: the set only grows, distances only
  * shrink), one tiny aggregate per iteration.
  *
  * Like [[ConnectedComponents]], every iteration cuts lineage with
  * `localCheckpoint` so plan depth stays O(1); the frontier frame is
  * O(|reached nodes|), never edges x paths. At cluster scale the same loop
  * runs with durable checkpoints (see ConnectedComponents' cut discipline);
  * hop-bounded traversals over pruned edge sets keep the per-iteration
  * shuffle proportional to the frontier, not the graph.
  */
object ShortestPaths {

  /** Driver-tail bound (the KCore / ConnectedComponents / PageRank
    * pattern): a hop-bounded traversal over an edge set this small runs as
    * an array BFS on the driver — integer distances, so bit-identical to
    * the distributed relaxation — instead of ~2 shuffle jobs per hop.
    */
  val DefaultDriverMaxEdges: Long = 2000000L

  /** @param edges two columns (src, dst), directed
    * @param source the single source node id
    * @param maxHops inclusive bound on path length explored
    * @param driverMaxEdges run the BFS in driver memory when the
    *   materialized edge list has at most this many rows; `0` forces the
    *   distributed loop (equality pinned in ShortestPathsSpec)
    * @return (node, hops) for every node reachable within `maxHops`,
    *   hops = exact BFS distance from `source`
    */
  def hops(edges: DataFrame, source: Long, maxHops: Int,
      driverMaxEdges: Long = DefaultDriverMaxEdges): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val spark = edges.sparkSession
    val Seq(s, d) = edges.columns.toSeq
    val e = edges.select(col(s).cast("long").as("src"), col(d).cast("long").as("dst"))
      .localCheckpoint()

    if (driverMaxEdges > 0 && driverMaxEdges < Int.MaxValue) {
      val probe = e.limit(driverMaxEdges.toInt + 1).collect()
      if (probe.length <= driverMaxEdges)
        return driverTail(spark, probe, source, maxHops)
    }

    import spark.implicits._
    var dist = Seq((source, 0L)).toDF("node", "hops")
    // (reached count, sum of distances): both monotone, equal iff converged
    def probe(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), coalesce(sum(col("hops")), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var prev = probe(dist)
    var iter = 0
    var converged = false
    while (!converged && iter < maxHops) {
      val relaxed = e.join(dist.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("hops") + 1).as("hops"))
      val next = dist.union(relaxed)
        .groupBy("node").agg(min(col("hops")).as("hops"))
        .localCheckpoint()
      val cur = probe(next)
      converged = cur == prev
      prev = cur
      dist = next
      iter += 1
    }
    dist
  }

  /** Array BFS over the collected edge list — exact hop distances, same
    * depth cap, same (node, hops) schema as the distributed relaxation.
    */
  private def driverTail(spark: org.apache.spark.sql.SparkSession,
      rows: Array[org.apache.spark.sql.Row], source: Long, maxHops: Int): DataFrame = {
    val idx = new java.util.HashMap[Long, Integer](rows.length * 2)
    val nodes = new scala.collection.mutable.ArrayBuffer[Long]
    def id(v: Long): Int = {
      val got = idx.get(v)
      if (got != null) got.intValue()
      else { val i = nodes.length; idx.put(v, i); nodes += v; i }
    }
    val m = rows.length
    val eSrc = new Array[Int](m); val eDst = new Array[Int](m)
    var i = 0
    while (i < m) { eSrc(i) = id(rows(i).getLong(0)); eDst(i) = id(rows(i).getLong(1)); i += 1 }
    // adjacency (CSR) over src
    val n = nodes.length
    val start = new Array[Int](n + 1)
    i = 0; while (i < m) { start(eSrc(i) + 1) += 1; i += 1 }
    i = 0; while (i < n) { start(i + 1) += start(i); i += 1 }
    val adj = new Array[Int](m)
    val fill = java.util.Arrays.copyOf(start, n)
    i = 0; while (i < m) { adj(fill(eSrc(i))) = eDst(i); fill(eSrc(i)) += 1; i += 1 }

    val dist = new java.util.HashMap[Long, Long]
    dist.put(source, 0L)
    val srcIdx = idx.get(source)
    if (srcIdx != null) {
      val hop = Array.fill(n)(-1)
      hop(srcIdx) = 0
      var frontier = List(srcIdx.intValue())
      var depth = 0
      while (frontier.nonEmpty && depth < maxHops) {
        var nextF = List.empty[Int]
        for (u <- frontier) {
          var j = start(u)
          while (j < start(u + 1)) {
            val v = adj(j)
            if (hop(v) < 0) { hop(v) = depth + 1; nextF ::= v }
            j += 1
          }
        }
        frontier = nextF
        depth += 1
      }
      i = 0
      while (i < n) { if (hop(i) >= 0) dist.put(nodes(i), hop(i).toLong); i += 1 }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("hops",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val out = new java.util.ArrayList[org.apache.spark.sql.Row](dist.size)
    dist.forEach((k, v) => { out.add(org.apache.spark.sql.Row(k, v)); () })
    spark.createDataFrame(out, schema)
  }
}
