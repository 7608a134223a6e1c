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

  /** @param edges two columns (src, dst), directed
    * @param source the single source node id
    * @param maxHops inclusive bound on path length explored
    * @return (node, hops) for every node reachable within `maxHops`,
    *   hops = exact BFS distance from `source`
    */
  def hops(edges: DataFrame, source: Long, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val spark = edges.sparkSession
    val Seq(s, d) = edges.columns.toSeq
    val e = edges.select(col(s).cast("long").as("src"), col(d).cast("long").as("dst"))
      .localCheckpoint()

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
}
