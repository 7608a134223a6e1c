package graft.operators

import org.apache.hadoop.fs.Path
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
  * pairs, never the growing lineage — the per-iteration cut caps plan depth.
  *
  * Cut durability: `localCheckpoint` stores blocks on executors, so an
  * executor loss mid-job kills the computation — acceptable in local mode,
  * not on a 1000-executor cluster. When the session has a checkpoint dir
  * (`sparkContext.setCheckpointDir`, typically HDFS) the iteration instead
  * cuts via explicit parquet round-trips in a per-run subdirectory — unlike
  * `Dataset.checkpoint` (whose files nothing deletes unless the GC-driven
  * cleaner happens to fire), each superseded iteration is deleted as the
  * loop advances, so a run holds at most edges + two label tables on disk.
  * The run directory (`<checkpointDir>/graft-cc-<uuid>`) keeps the edges and
  * final-labels files backing the RETURNED DataFrame; delete it once the
  * result has been consumed. `reliable` overrides the autodetection.
  */
object ConnectedComponents {

  /** @param pairs two-column DataFrame of undirected edges (a, b)
    * @param reliable force durable (`Some(true)`) or executor-local
    *   (`Some(false)`) lineage cuts; default picks durable iff a
    *   checkpoint dir is configured
    * @return (node, component) where component = min node id reachable
    */
  def run(pairs: DataFrame, maxIter: Int = 10,
      reliable: Option[Boolean] = None): DataFrame = {
    val spark = pairs.sparkSession
    val sc = spark.sparkContext
    val useReliable = reliable.getOrElse(sc.getCheckpointDir.isDefined)
    require(!useReliable || sc.getCheckpointDir.isDefined,
      "reliable checkpoints need sparkContext.setCheckpointDir(<durable path>)")

    val runDir = if (useReliable)
      Some(new Path(sc.getCheckpointDir.get, s"graft-cc-${java.util.UUID.randomUUID()}"))
    else None
    val fs = runDir.map(_.getFileSystem(spark.sessionState.newHadoopConf()))
    var cutId = 0
    // returns the cut frame plus its backing path (None in local mode)
    def cut(df: DataFrame): (DataFrame, Option[Path]) = runDir match {
      case Some(root) =>
        val p = new Path(root, s"cut-$cutId")
        cutId += 1
        df.write.parquet(p.toString)
        (spark.read.parquet(p.toString), Some(p))
      case None => (df.localCheckpoint(), None)
    }

    val Seq(a, b) = pairs.columns.toSeq
    // symmetric edge list; nodes with no edges never enter the frame (a
    // document without near-dup candidates needs no cluster row)
    val (edges, _) = cut(pairs.select(col(a).as("src"), col(b).as("dst"))
      .union(pairs.select(col(b).as("src"), col(a).as("dst")))
      .distinct())

    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    // empty edge set (legal: a corpus with no near-dup candidates) — the
    // sum probe below would read null forever and spin to maxIter; there is
    // nothing to propagate, so return the empty (node, component) frame now
    if (labels.isEmpty)
      return labels.select(col("node"), col("label").as("component"))
    var labelsPath: Option[Path] = None
    // convergence probe: labels move only DOWNWARD (new = min(old,
    // neighbors) <= old), so sum(label) strictly decreases until fixpoint —
    // an exact DECIMAL aggregate over the already-cut frame detects
    // convergence without joining consecutive label tables (null sentinel:
    // iteration 1 never reads as converged).
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .head().getDecimal(0)
    var prevSum: java.math.BigDecimal = null
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // each node's new label = min(own label, neighbors' labels)
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .select(col("src").as("node"), col("label"))
      val (next, nextPath) = cut(labels.select(col("node"), col("label"))
        .union(viaNeighbors)
        .groupBy("node").agg(min(col("label")).as("label")))
      val nextSum = labelSum(next)
      converged =
        if (nextSum != null) prevSum != null && nextSum.compareTo(prevSum) == 0
        else {
          // a null sum here is DECIMAL(38,0) overflow (null under non-ANSI
          // Spark) — the cheap probe is blind, so fall back to the exact
          // join-based check for this iteration instead of spinning to
          // maxIter and throwing on a graph that may already be converged
          next.as("n").join(labels.as("p"), col("n.node") === col("p.node"))
            .where(col("n.label") =!= col("p.label")).isEmpty
        }
      // the prior iteration's cut was fully consumed by the sum probe
      // above — delete it so disk holds O(1) tables, not O(iterations)
      labelsPath.foreach(p => fs.foreach(_.delete(p, true)))
      labels = next
      labelsPath = nextPath
      prevSum = nextSum
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
