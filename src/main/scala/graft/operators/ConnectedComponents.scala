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
  * When the materialized candidate graph is small (`driverMaxEdges`), a
  * driver union-find replaces the loop entirely — the KCore driver-tail
  * pattern: candidate PAIRS are already the pruned output of LSH/banding,
  * so at every scale the graph is orders of magnitude smaller than the
  * corpus, and per-iteration shuffle jobs dominate wall-clock on it.
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

  /** Default driver-tail bound: a symmetric edge list this size collects in
    * tens of MB and union-finds in well under a second — while each SAVED
    * distributed iteration costs two shuffle jobs. Mirrors KCore's
    * Batagelj–Zaversnik tail bound.
    */
  val DefaultDriverMaxEdges: Long = 2000000L

  /** @param pairs two-column DataFrame of undirected edges (a, b)
    * @param reliable force durable (`Some(true)`) or executor-local
    *   (`Some(false)`) lineage cuts; default picks durable iff a
    *   checkpoint dir is configured
    * @param driverMaxEdges near-dup candidate graphs are usually ≪ corpus
    *   size (pairs are the OUTPUT of LSH/banding pruning): when the
    *   materialized symmetric edge list has at most this many rows and
    *   integral node ids, skip the iterative loop and union-find on the
    *   driver — O(m α) with one collect, vs ~2 shuffle jobs per propagation
    *   round. `0` forces the distributed path (the 100 TB shape, and the
    *   spec's equality pin). Identical output either way: (node, min
    *   reachable id).
    * @return (node, component) where component = min node id reachable
    */
  def run(pairs: DataFrame, maxIter: Int = 10,
      reliable: Option[Boolean] = None,
      driverMaxEdges: Long = DefaultDriverMaxEdges): DataFrame = {
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

    // driver tail: one limit-probe collect on the already-cut edge list —
    // if it comes back complete (≤ bound rows), the whole component
    // structure fits in driver memory and the loop below would only burn
    // per-iteration shuffle jobs on it. Integral ids only: min-label order
    // for strings is UTF8-binary on the cluster and must not silently
    // diverge from Java's UTF-16 compareTo here.
    val integralNodes = edges.schema.head.dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    if (integralNodes && driverMaxEdges > 0 && driverMaxEdges < Int.MaxValue) {
      val probe = edges.limit(driverMaxEdges.toInt + 1).collect()
      if (probe.length <= driverMaxEdges) {
        // the collected rows are the whole graph — the runDir cut (if any)
        // backs nothing the result references
        runDir.foreach(p => fs.foreach(_.delete(p, true)))
        return driverUnionFind(spark, probe, edges.schema)
      }
    }

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

  /** Path-halving weighted union-find over the collected symmetric edge
    * list; each root carries the min-valued member, so the output matches
    * the distributed min-label fixpoint exactly. Bounded by the caller's
    * `driverMaxEdges` probe; original boxed node values (and hence the
    * column type) round-trip untouched.
    */
  private def driverUnionFind(spark: org.apache.spark.sql.SparkSession,
      edgeRows: Array[org.apache.spark.sql.Row],
      edgeSchema: org.apache.spark.sql.types.StructType): DataFrame = {
    val idx = new java.util.HashMap[Any, Integer](edgeRows.length * 2)
    val nodes = new scala.collection.mutable.ArrayBuffer[Any]
    def id(v: Any): Int = {
      val got = idx.get(v)
      if (got != null) got.intValue()
      else { val i = nodes.length; idx.put(v, i); nodes += v; i }
    }
    val srcIdx = new Array[Int](edgeRows.length)
    val dstIdx = new Array[Int](edgeRows.length)
    var i = 0
    while (i < edgeRows.length) {
      srcIdx(i) = id(edgeRows(i).get(0)); dstIdx(i) = id(edgeRows(i).get(1)); i += 1
    }
    val n = nodes.length
    val parent = Array.tabulate(n)(identity)
    val size = Array.fill(n)(1)
    val minAt = Array.tabulate(n)(identity) // index of the min-valued member per root
    def value(j: Int): Long = nodes(j).asInstanceOf[Number].longValue()
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    i = 0
    while (i < edgeRows.length) {
      val (ra, rb) = (find(srcIdx(i)), find(dstIdx(i)))
      if (ra != rb) {
        val (big, small) = if (size(ra) >= size(rb)) (ra, rb) else (rb, ra)
        parent(small) = big
        size(big) += size(small)
        if (value(minAt(small)) < value(minAt(big))) minAt(big) = minAt(small)
      }
      i += 1
    }
    val dt = edgeSchema.head.dataType
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node", dt, nullable = false),
      org.apache.spark.sql.types.StructField("component", dt, nullable = false)))
    val out = new java.util.ArrayList[org.apache.spark.sql.Row](n)
    i = 0
    while (i < n) {
      out.add(org.apache.spark.sql.Row(nodes(i), nodes(minAt(find(i)))))
      i += 1
    }
    spark.createDataFrame(out, outSchema)
  }
}
