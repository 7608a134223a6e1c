package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — turns near-dup
  * candidate PAIRS (MinHash/SimHash/cosine output) into dedup CLUSTERS, the
  * step that decides which documents actually survive a dedup pass.
  *
  * Each iteration is one shuffle: every node adopts the smallest label in
  * its neighborhood (neighbors ∪ self); convergence in O(diameter)
  * iterations. Near-dup graphs are overwhelmingly tiny star/clique
  * components, so 3–5 iterations close almost any real corpus; `maxIter`
  * bounds the pathological chain. Each loop materializes only (node, label)
  * pairs, never the growing lineage — the per-iteration checkpoint cuts it.
  *
  * Checkpoint durability: `localCheckpoint` stores blocks on executors, so
  * an executor loss mid-job kills the computation — acceptable in local
  * mode, not on a 1000-executor cluster. When the session has a reliable
  * checkpoint dir (`sparkContext.setCheckpointDir`, typically HDFS) the
  * iteration automatically checkpoints there instead; `reliable` overrides
  * the autodetection either way.
  */
object ConnectedComponents {

  /** @param pairs two-column DataFrame of undirected edges (a, b)
    * @param reliable force reliable (`Some(true)`) or executor-local
    *   (`Some(false)`) lineage cuts; default picks reliable iff a
    *   checkpoint dir is configured
    * @return (node, component) where component = min node id reachable
    */
  def run(pairs: DataFrame, maxIter: Int = 10,
      reliable: Option[Boolean] = None): DataFrame = {
    val sc = pairs.sparkSession.sparkContext
    val useReliable = reliable.getOrElse(sc.getCheckpointDir.isDefined)
    require(!useReliable || sc.getCheckpointDir.isDefined,
      "reliable checkpoints need sparkContext.setCheckpointDir(<durable path>)")
    def cut(df: DataFrame): DataFrame =
      if (useReliable) df.checkpoint() else df.localCheckpoint()

    val Seq(a, b) = pairs.columns.toSeq
    // symmetric edge list; nodes with no edges never enter the frame (a
    // document without near-dup candidates needs no cluster row)
    val edges = cut(pairs.select(col(a).as("src"), col(b).as("dst"))
      .union(pairs.select(col(b).as("src"), col(a).as("dst")))
      .distinct())

    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // each node's new label = min(own label, neighbors' labels)
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .select(col("src").as("node"), col("label"))
      val next = cut(labels.select(col("node"), col("label"))
        .union(viaNeighbors)
        .groupBy("node").agg(min(col("label")).as("label"))) // lineage cut → O(1) plans per iteration
      val changed = next.join(labels.withColumnRenamed("label", "old"), Seq("node"))
        .filter(col("label") =!= col("old")).limit(1).count()
      converged = changed == 0
      labels = next
      iter += 1
    }
    // non-convergence would silently split real clusters (duplicate docs
    // surviving a dedup pass) — fail loudly; callers raise maxIter instead
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter iterations — " +
          "raise maxIter (components merge one hop per iteration)")
    labels.select(col("node"), col("label").as("component"))
  }
}
