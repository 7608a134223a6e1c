package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition (coreness per node) by distributed peeling — the
  * standard degeneracy-ordering algorithm expressed as Spark aggregates:
  *
  * repeat: compute degrees of the remaining graph (one groupBy); set
  * `k = max(k, min degree)` and remove every node whose degree is ≤ k (two
  * anti joins), recording coreness k. Jumping k to the running max of min
  * degrees means EVERY round removes at least one node — no empty
  * k-stepping rounds — which is the classic degeneracy-ordering invariant:
  * when the min degree first reaches d the remaining graph is a d-core, so
  * nodes peeled at level k have coreness exactly k. Coreness is the
  * community-strength / graph-sparsification signal (a 25-core member sits
  * in a dense cluster; coreness 1 is a tree fringe).
  *
  * Every round is a constant number of shuffles on the shrinking edge list
  * plus exactly ONE blocking driver probe (min degree and active count in a
  * single aggregate — round latency is per-iteration job count, so probes
  * are halved, not doubled up). Frames are lineage-cut per round with the
  * same durability rules as [[ConnectedComponents]] (parquet round-trips
  * under a checkpoint dir when configured, `localCheckpoint` otherwise):
  * plan depth stays O(1) in the iteration count, and because each round
  * persists its SMALL removal set while the previous round's (node, deg)
  * cut is deleted as soon as the next is materialized, retained disk stays
  * O(n) at any moment (removal cuts sum to O(n) across the whole run).
  * Rounds equal the number of peel waves (≤ node count, typically tiny) —
  * `maxIter` guards the pathological chain and failure is loud, never a
  * silently-partial result.
  *
  * Nodes without edges never appear (degree-0 convention shared with
  * ConnectedComponents: callers union isolated nodes at coreness 0 if they
  * need them).
  */
object KCore {

  /** @param pairs two-column DataFrame of undirected edges (a, b);
    *   self-loops are dropped
    * @return (node, coreness)
    */
  def decompose(pairs: DataFrame, maxIter: Int = 200,
      reliable: Option[Boolean] = None): DataFrame = {
    val spark = pairs.sparkSession
    val sc = spark.sparkContext
    val useReliable = reliable.getOrElse(sc.getCheckpointDir.isDefined)
    require(!useReliable || sc.getCheckpointDir.isDefined,
      "reliable checkpoints need sparkContext.setCheckpointDir(<durable path>)")

    val runDir = if (useReliable)
      Some(new Path(sc.getCheckpointDir.get, s"graft-kcore-${java.util.UUID.randomUUID()}"))
    else None
    val fs = runDir.map(_.getFileSystem(spark.sessionState.newHadoopConf()))
    var cutId = 0
    def cut(df: DataFrame): (DataFrame, Option[Path]) = runDir match {
      case Some(root) =>
        val p = new Path(root, s"cut-$cutId")
        cutId += 1
        df.write.parquet(p.toString)
        (spark.read.parquet(p.toString), Some(p))
      case None => (df.localCheckpoint(), None)
    }

    val Seq(a, b) = pairs.columns.toSeq
    var (remaining, remainingPath) = cut(
      pairs.select(col(a).as("src"), col(b).as("dst"))
        .union(pairs.select(col(b).as("src"), col(a).as("dst")))
        .where(col("src") =!= col("dst"))
        .distinct())

    // explicit active-node set: a node whose last neighbor is peeled VANISHES
    // from the edge list (degree 0), but still needs its coreness assigned —
    // membership in `active`, not presence in `remaining`, drives removal
    var (active, activePath) = cut(remaining.select(col("src").as("node")).distinct())

    // peel by running-max of min degree: every round removes >= 1 node (no
    // empty k-stepping rounds), and a removed node's coreness is the
    // current k = max over rounds of the min degree seen so far.
    // Per round: ONE driver probe (min degree + active count in a single
    // head() — emptiness is derived from the count, so no separate
    // isEmpty action) and THREE cuts — the (node, deg) frame, the SMALL
    // removal set (O(removed) rows, summing to O(n) across all rounds),
    // and the shrunken edge list. The previous round's (node, deg) cut is
    // deleted as soon as the current one is materialized, so retained
    // disk stays O(n) at any moment, never O(n · rounds).
    var k = 0L
    var iter = 0
    var finished = false
    var prevWdPath: Option[Path] = None
    val removedParts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val removedPaths = scala.collection.mutable.ArrayBuffer.empty[Path]
    while (!finished) {
      val deg = remaining.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val (wd, wdPath) = cut(active
        .join(deg.withColumnRenamed("src", "node"), Seq("node"), "left")
        .select(col("node"), coalesce(col("deg"), lit(0L)).as("deg")))
      // wd is materialized: the frames feeding it (previous wd via
      // `active`, initial active cut) are no longer referenced — delete
      prevWdPath.foreach(p => fs.foreach(_.delete(p, true)))
      prevWdPath = wdPath
      activePath.foreach(p => fs.foreach(_.delete(p, true)))
      activePath = None
      // one probe: (min degree, active count); count first — min is NULL
      // on an empty frame
      val probe = wd.agg(min(col("deg")).as("dmin"), count(lit(1)).as("n")).head()
      if (probe.getLong(1) == 0L) finished = true
      else if (iter >= maxIter)
        throw new IllegalStateException(
          s"k-core peeling did not finish in $maxIter rounds — raise maxIter " +
            "(every round peels the current min-degree wave)")
      else {
        k = math.max(k, probe.getLong(0))
        val toRemove = wd.where(col("deg") <= k).select(col("node"))
        val (removedCut, removedPath) = cut(toRemove.withColumn("coreness", lit(k)))
        removedParts += removedCut
        removedPath.foreach(removedPaths += _)
        val (nextRem, nextRemPath) = cut(
          remaining
            .join(toRemove.withColumnRenamed("node", "src"), Seq("src"), "left_anti")
            .join(toRemove.withColumnRenamed("node", "dst"), Seq("dst"), "left_anti")
            .select(col("src"), col("dst")))
        remainingPath.foreach(p => fs.foreach(_.delete(p, true)))
        remaining = nextRem
        remainingPath = nextRemPath
        active = wd.where(col("deg") > k).select(col("node"))
        iter += 1
      }
    }
    // empty-graph fallback reads NOTHING (limit 0 over the caller's frame):
    // the initial active cut is already deleted by the first round's probe
    val result = removedParts.reduceOption(_ union _)
      .getOrElse(pairs.select(col(a).as("node")).limit(0)
        .withColumn("coreness", lit(0L)))
    // materialize the union before the per-round removal files are deleted
    val (core, _) = cut(result)
    removedPaths.foreach(p => fs.foreach(_.delete(p, true)))
    prevWdPath.foreach(p => fs.foreach(_.delete(p, true)))
    remainingPath.foreach(p => fs.foreach(_.delete(p, true)))
    core
  }
}
