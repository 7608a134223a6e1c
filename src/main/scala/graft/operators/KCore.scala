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
  * plus exactly ONE blocking driver probe (min degree, active count, and
  * remaining directed-edge count in a single aggregate — round latency is
  * per-iteration job count, so probes are folded, never doubled up). Once
  * the remaining graph fits `driverMaxEdges`, the peel finishes on the
  * driver in one collect (exact Batagelj–Zaversnik, clamped to the running
  * level — identical output, spec-pinned), replacing the long tail of
  * tiny-wave rounds whose cost is pure scheduler latency. Frames are lineage-cut per round with the
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

  /** Directed-edge cap under which the peel finishes ON THE DRIVER with the
    * exact Batagelj–Zaversnik bucket algorithm (O(E+N), ~16 bytes/edge ⇒
    * ≤ ~32 MB at the default). Same threshold-switch discipline as
    * [[BpeTrainer]]: the distributed rounds are the scale path and shrink
    * the graph; once the tail fits the bound, one collect replaces the
    * remaining O(waves) rounds of driver-probe latency. Equality of the two
    * paths is pinned in KCoreSpec (`driverMaxEdges = 0` forces all-
    * distributed).
    */
  val DefaultDriverMaxEdges = 1 << 21

  /** @param pairs two-column DataFrame of undirected edges (a, b);
    *   self-loops are dropped
    * @param driverMaxEdges finish in-memory once the remaining DIRECTED edge
    *   count is ≤ this bound (0 disables the driver tail entirely)
    * @return (node, coreness)
    */
  def decompose(pairs: DataFrame, maxIter: Int = 200,
      reliable: Option[Boolean] = None,
      driverMaxEdges: Long = DefaultDriverMaxEdges): DataFrame = {
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
      // one probe: (min degree, active count, directed edge count = sum of
      // degrees); count first — min/sum are NULL on an empty frame
      val probe = wd.agg(min(col("deg")).as("dmin"), count(lit(1)).as("n"),
        sum(col("deg")).as("m")).head()
      val nActive = probe.getLong(1)
      val mDirected = if (probe.isNullAt(2)) 0L else probe.getLong(2)
      if (nActive == 0L) finished = true
      else if (driverMaxEdges > 0 && mDirected <= driverMaxEdges &&
          nActive <= driverMaxEdges) {
        // driver tail: the remainder fits the hard bound — ONE collect of
        // (node, deg) + the directed edge list replaces the remaining
        // O(peel waves) rounds. Coreness = max(k, exact subgraph coreness):
        // every removed node has coreness <= k, so the c-cores for c > k are
        // untouched subgraphs of `remaining` (subgraph coreness = original
        // coreness), and survivors whose original coreness is exactly k are
        // clamped up to k — bit-identical to running the loop to completion
        // (pinned against driverMaxEdges=0 in KCoreSpec).
        removedParts += driverTail(spark, wd, remaining, k)
        finished = true
      }
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

  /** Exact Batagelj–Zaversnik bucket peel (public algorithm, "An O(m)
    * Algorithm for Cores Decomposition of Networks", 2003) over the
    * collected tail, clamped to the running peel level `kFloor`. Bounded by
    * the caller's `driverMaxEdges` check; node values stay generic (`Any`).
    */
  private def driverTail(spark: org.apache.spark.sql.SparkSession,
      wd: DataFrame, remaining: DataFrame, kFloor: Long): DataFrame = {
    val nodeRows = wd.select(col("node"), col("deg")).collect()
    val n = nodeRows.length
    val idx = new java.util.HashMap[Any, Integer](n * 2)
    val nodeOf = new Array[Any](n)
    val deg = new Array[Int](n)
    var i = 0
    while (i < n) {
      idx.put(nodeRows(i).get(0), i)
      nodeOf(i) = nodeRows(i).get(0)
      deg(i) = nodeRows(i).getLong(1).toInt
      i += 1
    }
    // CSR adjacency from the (already symmetric) directed edge list; every
    // endpoint is active by the loop invariant (edges are anti-joined on
    // removal, nodes only leave `active` when removed)
    val edgeRows = remaining.collect()
    val m = edgeRows.length
    val eSrc = new Array[Int](m)
    val eDst = new Array[Int](m)
    i = 0
    while (i < m) {
      eSrc(i) = idx.get(edgeRows(i).get(0))
      eDst(i) = idx.get(edgeRows(i).get(1))
      i += 1
    }
    val adjStart = new Array[Int](n + 1)
    i = 0; while (i < m) { adjStart(eSrc(i) + 1) += 1; i += 1 }
    i = 0; while (i < n) { adjStart(i + 1) += adjStart(i); i += 1 }
    val adj = new Array[Int](m)
    val fill = java.util.Arrays.copyOf(adjStart, n)
    i = 0; while (i < m) { adj(fill(eSrc(i))) = eDst(i); fill(eSrc(i)) += 1; i += 1 }

    // bucket sort nodes by degree; peel in order, decrementing neighbors
    val maxDeg = if (n == 0) 0 else deg.max
    val binStart = new Array[Int](maxDeg + 2)
    i = 0; while (i < n) { binStart(deg(i) + 1) += 1; i += 1 }
    i = 0; while (i <= maxDeg) { binStart(i + 1) += binStart(i); i += 1 }
    val vert = new Array[Int](n)
    val pos = new Array[Int](n)
    val binFill = java.util.Arrays.copyOf(binStart, maxDeg + 1)
    i = 0; while (i < n) { val d = deg(i); vert(binFill(d)) = i; pos(i) = binFill(d); binFill(d) += 1; i += 1 }
    i = 0
    while (i < n) {
      val v = vert(i)
      var e = adjStart(v)
      while (e < adjStart(v + 1)) {
        val u = adj(e)
        if (deg(u) > deg(v)) {
          // swap u with the first vertex of its current degree bin, then
          // shrink u's degree by one (u moves into the lower bin)
          val du = deg(u)
          val pu = pos(u)
          val pw = binStart(du)
          val w = vert(pw)
          if (u != w) {
            vert(pu) = w; pos(w) = pu
            vert(pw) = u; pos(u) = pw
          }
          binStart(du) += 1
          deg(u) = du - 1
        }
        e += 1
      }
      i += 1
    }
    // deg now holds exact subgraph core numbers; clamp to the running level
    val out = new Array[org.apache.spark.sql.Row](n)
    i = 0
    while (i < n) {
      out(i) = org.apache.spark.sql.Row(nodeOf(i), math.max(kFloor, deg(i).toLong))
      i += 1
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      wd.schema("node"),
      org.apache.spark.sql.types.StructField("coreness",
        org.apache.spark.sql.types.LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toIndexedSeq, 1), schema)
      .select(col("node"), col("coreness"))
  }
}
