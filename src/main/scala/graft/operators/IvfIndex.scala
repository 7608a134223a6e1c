package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-style approximate nearest neighbor: partition vectors into `nLists`
  * inverted lists by nearest centroid, then search only the `nProbe` lists
  * closest to each query — the standard recall/cost dial (nProbe = nLists
  * degenerates to exact brute force).
  *
  * Centroids come from a seeded deterministic sample of the data itself
  * (k-means++-free: fine for a test-scale index; swap in trained centroids in
  * production — the plan shape is identical). List assignment is one narrow
  * mapPartitions with primitive loops; the probe is a broadcast of
  * (query, probed-list) pairs joined against the bucketed table, so the
  * shuffle is bounded by candidate lists, never all-pairs.
  */
object IvfIndex {

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def nearestLists(v: Array[Double], cents: Array[Array[Double]],
      nProbe: Int): Array[Int] =
    cents.indices
      .map(c => (c, -cosine(v, cents(c))))
      .sortBy(_._2).take(nProbe).map(_._1).toArray

  private def cosine(a: Array[Double], b: Array[Double]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  /** Top-k neighbors per query id (queryPred selects queries) searching only
    * nProbe inverted lists: (query_id, neighbor_id, sim, rnk).
    */
  def topK(df: DataFrame, idCol: String, vecCol: String,
      queryPred: org.apache.spark.sql.Column, k: Int,
      nLists: Int, nProbe: Int, seed: Long = 4242L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // deterministic centroids: the nLists rows with the smallest seeded
    // md5 of their id — a uniform pseudo-random pick that needs no row
    // count (sizing a sample fraction would cost an extra full-scan job)
    // and plans as TakeOrderedAndProject: per-partition top-k, driver-side
    // merge only. md5 (not xxhash64) keeps the pick ENGINE-PORTABLE, so
    // the whole index replays in the DuckDB oracle (q59).
    val cents = df
      .select(col(idCol).cast("long").as("__cid"),
        col(vecCol).cast("array<double>").as("__cvec"))
      .orderBy(md5(concat_ws(":", lit(seed), col("__cid"))), col("__cid"))
      .limit(nLists)
      .as[(Long, Array[Double])]
      .collect()
      .sortBy(_._1).map(_._2)
    require(cents.length == nLists, s"not enough rows for $nLists centroids")
    topKWithCentroids(df, idCol, vecCol, queryPred, k, nProbe, cents)
  }

  /** [[topK]] with TRAINED centroids: Lloyd-fitted lists place related
    * vectors together, so a small nProbe recalls what a sampled pick only
    * finds at higher probe cost on CLUSTERED data — the production path
    * (sampled centroids stay the oracle-replayable path, q59). One k-means
    * fit (itself distributed, seeded, deterministic) + the identical
    * probe plan.
    */
  def topKTrained(df: DataFrame, idCol: String, vecCol: String,
      queryPred: org.apache.spark.sql.Column, k: Int,
      nLists: Int, nProbe: Int, iters: Int = 8, seed: Long = 4242L): DataFrame = {
    val model = KMeans.fit(df, idCol, vecCol, k = nLists, iters = iters,
      seed = seed)
    topKWithCentroids(df, idCol, vecCol, queryPred, k, nProbe,
      model.centroids.map(_.clone()))
  }

  /** The IVF probe plan over EXPLICIT centroids — assignment, bounded
    * probe, per-query top-k. Centroid COUNT defines the lists.
    */
  def topKWithCentroids(df: DataFrame, idCol: String, vecCol: String,
      queryPred: org.apache.spark.sql.Column, k: Int, nProbe: Int,
      cents: Array[Array[Double]]): DataFrame = {
    require(cents.nonEmpty, "need at least one centroid")
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
    val bcCents = spark.sparkContext.broadcast(cents)

    // localCheckpoint: the assignment pass feeds both the query collect and
    // the scoring scan — without it the mapPartitions recomputes twice
    val assigned = vecs.mapPartitions { it =>
      val cs = bcCents.value
      it.map { case (id, v) => (id, v, nearestLists(v, cs, 1)(0)) }
    }.toDF(idCol, "vec", "list").localCheckpoint()

    val queries = assigned
      .filter(queryPred)
      .as[(Long, Array[Double], Int)]
      .collect()
      .map { case (id, v, _) => (id, v, nearestLists(v, bcCents.value, nProbe)) }
    val bcQueries = spark.sparkContext.broadcast(queries)

    val scored = assigned.as[(Long, Array[Double], Int)].mapPartitions { it =>
      val qs = bcQueries.value
      it.flatMap { case (id2, v2, list2) =>
        qs.iterator
          .filter { case (qid, _, probed) => qid != id2 && probed.contains(list2) }
          .map { case (qid, qv, _) => (qid, id2, cosine(qv, v2)) }
      }
    }.toDF("query_id", "neighbor_id", "sim")

    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }
}
