package graft.operators

import graft.functions.expressions.CosineSimilarity.cosineSim
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact cosine similarity over an embedding column, expressed as broadcast
  * joins with a codegen'd `cosine_sim` Catalyst expression as the distance
  * kernel (see [[graft.functions.expressions.CosineSimilarity]]).
  *
  * Shape: `probe JOIN broadcast(build)` plans as BroadcastNestedLoopJoin —
  * the build side is serialized executor-side by the broadcast exchange
  * (never a driver-side `collect()`), the probe side streams per partition,
  * and each task scores its slice of the pair space inside one whole-stage
  * codegen span. The build side must fit in executor memory (the standard
  * broadcast-join constraint); beyond that, the scale paths are the
  * LSH-bucketed ANN (q44), IVF (q59), or banded MinHash/SimHash dedup.
  *
  * The expression accumulates in ascending index order, so results are
  * bit-identical to the naive fold (and the DuckDB oracle).
  */
object BruteForceCosine {

  /** All pairs (id1 < id2) with cosine similarity ≥ threshold:
    * (id1, id2, sim). `sim` is unrounded; round at the call site.
    *
    * Exact all-pairs is inherently O(n²) in comparisons — this is the
    * correctness baseline; its cost knob at scale is the broadcast build
    * side, not driver memory.
    */
  def pairsAbove(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val vecs = df.select(
      col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("vec"))
    val probe = vecs.toDF("id1", "v1")
    val build = vecs.toDF("id2", "v2")
    probe.join(broadcast(build), col("id1") < col("id2"))
      .select(col("id1"), col("id2"), cosineSim(col("v1"), col("v2")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Exact all pairs (id1 < id2, cosine ≥ threshold) with NO broadcast — the
    * scale path past [[pairsAbove]]'s broadcast-build constraint. The
    * upper-triangle pair space is tiled into `nBlocks·(nBlocks+1)/2` hash
    * tiles keyed by (p, q): the left side replicates each row to every tile
    * in its block's row, the right side to every tile in its block's column,
    * then one shuffle join on the tile key lands each tile on one task.
    * Shuffle volume is O(n·nBlocks) rows and per-task memory is
    * O(n/nBlocks) — both tunable, neither driver- nor executor-broadcast-
    * bound. Comparisons stay exactly the O(n²) the semantics demand.
    *
    * A cross-block pair meets in exactly one tile (smaller block on the
    * left), a same-block pair twice — `p != q OR id < id2` keeps one. The
    * kernel is symmetric bit-for-bit (double · and + are commutative;
    * accumulation order is fixed), so least/greatest output is safe.
    *
    * Pick nBlocks ≈ √(2 · cluster cores) so every core gets a tile.
    */
  def pairsAboveBlocked(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nBlocks: Int = 8): DataFrame = {
    require(nBlocks > 0, s"nBlocks must be positive, got $nBlocks")
    val vecs = df.select(
      col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("vec"))
    def blk(c: org.apache.spark.sql.Column) =
      pmod(xxhash64(c), lit(nBlocks.toLong)).cast("int")
    val left = vecs.toDF("id1", "v1")
      .withColumn("p", blk(col("id1")))
      .withColumn("q", explode(sequence(col("p"), lit(nBlocks - 1))))
    val right = vecs.toDF("id2", "v2")
      .withColumn("q", blk(col("id2")))
      .withColumn("p", explode(sequence(lit(0), col("q"))))
    left.join(right, Seq("p", "q"))
      .filter(col("p") =!= col("q") || col("id1") < col("id2"))
      .select(
        least(col("id1"), col("id2")).as("id1"),
        greatest(col("id1"), col("id2")).as("id2"),
        cosineSim(col("v1"), col("v2")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Exact top-k neighbors for a set of query ids: (query_id, neighbor_id,
    * sim, rnk). The filtered query side is broadcast; every probe partition
    * scores its rows against each query, then one shuffle ranks k per query.
    */
  def topK(df: DataFrame, idCol: String, vecCol: String,
      queryPred: org.apache.spark.sql.Column, k: Int): DataFrame = {
    val queries = df.filter(queryPred).select(
      col(idCol).cast("long").as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val probe = df.select(
      col(idCol).cast("long").as("neighbor_id"),
      col(vecCol).cast("array<double>").as("nv"))
    val scored = probe.join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineSim(col("qv"), col("nv")).as("sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Contrastive hard-negative mining: for each query vector, the k most
    * cosine-similar vectors whose LABEL DIFFERS from the query's — the
    * pairs a contrastive trainer wants as negatives precisely because the
    * embedding thinks they're alike. Same plan shape as [[topK]] (filtered
    * query side broadcast, per-partition scoring, one shuffle to rank k per
    * query); the label inequality rides the join condition, so mismatched
    * pairs are dropped before the similarity kernel runs.
    *
    * @return (query_id, qlabel, neighbor_id, nlabel, sim, rnk)
    */
  def hardNegatives(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, queryPred: org.apache.spark.sql.Column, k: Int): DataFrame = {
    val queries = df.filter(queryPred).select(
      col(idCol).cast("long").as("query_id"),
      col(labelCol).cast("long").as("qlabel"),
      col(vecCol).cast("array<double>").as("qv"))
    val probe = df.select(
      col(idCol).cast("long").as("neighbor_id"),
      col(labelCol).cast("long").as("nlabel"),
      col(vecCol).cast("array<double>").as("nv"))
    val scored = probe.join(broadcast(queries),
        col("query_id") =!= col("neighbor_id") && col("qlabel") =!= col("nlabel"))
      .select(col("query_id"), col("qlabel"), col("neighbor_id"), col("nlabel"),
        cosineSim(col("qv"), col("nv")).as("sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }
}
