package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition (coreness per node) by distributed peeling — the
  * standard degeneracy-ordering algorithm expressed as Spark aggregates:
  *
  * repeat: compute degrees of the remaining graph (one groupBy); remove
  * every node whose degree is below the current k (two anti joins), and
  * record its coreness as k−1; when nothing is removable, raise k. A node's
  * coreness is the largest k such that it survives in a subgraph of minimum
  * degree k — the classic community-strength / graph-sparsification signal
  * (a 25-core member sits in a dense cluster; coreness 1 is a tree fringe).
  *
  * Every round is a constant number of shuffles on the shrinking edge list,
  * and the edge frame + coreness accumulator are lineage-cut per round with
  * the same durability rules as [[ConnectedComponents]] (parquet round-trips
  * under a checkpoint dir when configured, `localCheckpoint` otherwise), so
  * plan depth and retained disk stay O(1) in the iteration count. Rounds are
  * bounded by (degeneracy + number of peel waves) — `maxIter` guards the
  * pathological chain and failure is loud, never a silently-partial result.
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

    var core = active.where(lit(false)).withColumn("coreness", lit(0L))
    var corePath: Option[Path] = None
    var k = 1L
    var iter = 0
    var done = active.isEmpty
    while (!done && iter < maxIter) {
      val deg = remaining.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val toRemove = active
        .join(deg.withColumnRenamed("src", "node"), Seq("node"), "left")
        .where(coalesce(col("deg"), lit(0L)) < k)
        .select(col("node"))
      if (toRemove.isEmpty) {
        k += 1
      } else {
        val (nextCore, nextCorePath) = cut(
          core.union(toRemove.withColumn("coreness", lit(k - 1))))
        val (nextRem, nextRemPath) = cut(
          remaining
            .join(toRemove.withColumnRenamed("node", "src"), Seq("src"), "left_anti")
            .join(toRemove.withColumnRenamed("node", "dst"), Seq("dst"), "left_anti")
            .select(col("src"), col("dst")))
        val (nextActive, nextActivePath) = cut(
          active.join(toRemove, Seq("node"), "left_anti"))
        corePath.foreach(p => fs.foreach(_.delete(p, true)))
        remainingPath.foreach(p => fs.foreach(_.delete(p, true)))
        activePath.foreach(p => fs.foreach(_.delete(p, true)))
        core = nextCore
        corePath = nextCorePath
        remaining = nextRem
        remainingPath = nextRemPath
        active = nextActive
        activePath = nextActivePath
        done = active.isEmpty
      }
      iter += 1
    }
    if (!done)
      throw new IllegalStateException(
        s"k-core peeling did not finish in $maxIter rounds — raise maxIter " +
          "(rounds are bounded by degeneracy + peel waves)")
    core
  }
}
