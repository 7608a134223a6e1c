package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Exact cosine similarity over an embedding column with tight primitive
  * loops instead of interpreted array higher-order functions.
  *
  * Shape: broadcast block-nested-loop — the build side (id, vector, ‖v‖²)
  * is broadcast once, the probe side streams per partition, each task does
  * its slice of the O(n²) pair space with JVM double loops. This is the same
  * execution contract as Spark's BroadcastNestedLoopJoin, ~20× faster than
  * `aggregate(zip_with(...))` per pair. The build side must fit in executor
  * memory (broadcast-join constraint); beyond that, the scale path is the
  * LSH-bucketed ANN (see graft.queries.Similarity q44) or banded MinHash.
  *
  * Double accumulation runs in ascending index order so results are
  * bit-identical to the naive fold (and the DuckDB oracle).
  */
object BruteForceCosine {

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** All pairs (id1 < id2) with cosine similarity ≥ threshold:
    * (id1, id2, sim). `sim` is unrounded; round at the call site.
    */
  def pairsAbove(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs: Dataset[(Long, Array[Double])] = df
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
    val build = vecs.collect().sortBy(_._1).map { case (id, v) => (id, v, dot(v, v)) }
    val bc = spark.sparkContext.broadcast(build)
    vecs.mapPartitions { it =>
      val arr = bc.value
      it.flatMap { case (id1, v1) =>
        val n1 = math.sqrt(dot(v1, v1))
        arr.iterator
          .filter(_._1 > id1)
          .map { case (id2, v2, nn2) => (id1, id2, dot(v1, v2) / (n1 * math.sqrt(nn2))) }
          .filter(_._3 >= threshold)
      }
    }.toDF("id1", "id2", "sim")
  }

  /** Exact top-k neighbors for a set of query ids: (query_id, neighbor_id,
    * sim, rnk). Queries are broadcast; each probe partition scores its rows
    * against every query, then a single narrow aggregation keeps k per query.
    */
  def topK(df: DataFrame, idCol: String, vecCol: String,
      queryPred: org.apache.spark.sql.Column, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
    val queries = df.filter(queryPred)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .collect().map { case (id, v) => (id, v, math.sqrt(dot(v, v))) }
    val bc = spark.sparkContext.broadcast(queries)
    val scored = vecs.mapPartitions { it =>
      val qs = bc.value
      it.flatMap { case (id2, v2) =>
        val n2 = math.sqrt(dot(v2, v2))
        qs.iterator
          .filter(_._1 != id2)
          .map { case (qid, qv, qn) => (qid, id2, dot(qv, v2) / (qn * n2)) }
      }
    }.toDF("query_id", "neighbor_id", "sim")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }
}
