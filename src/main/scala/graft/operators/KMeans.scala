package graft.operators

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic Lloyd's k-means over an embedding column — the clustering
  * primitive behind semantic dedup, topic balancing, and SemDeDup-style
  * curation of a 100 TB corpus.
  *
  * Scale shape per iteration (the classic Spark k-means layout, cf. the
  * published MLlib design):
  *   - ASSIGN: centroids are a driver-side k×dim array folded into literal
  *     expressions, so assignment is one narrow codegen'd projection over the
  *     data — k squared-distance folds per row, no shuffle, no UDF boxing.
  *   - UPDATE: `posexplode` + partial/final aggregation — one shuffle of
  *     k·dim partial sums per task (NOT the vectors themselves), then a
  *     bounded k·dim-row collect.
  * Driver state is O(k·dim) only; the data never leaves the executors.
  *
  * Determinism contract (so reruns and tests agree bit-for-bit):
  *   - init picks the k rows with the smallest `xxhash64(id)` (seeded) via
  *     `orderBy(...).limit(k)` — a TakeOrderedAndProject, not a sample;
  *   - centroid components and inertia are summed as DECIMAL(30,10) (exact,
  *     order-independent) and divided driver-side at fixed scale, so the
  *     shuffle's nondeterministic reduce order cannot perturb doubles;
  *   - per-row distances fold left-to-right over the array (fixed order) and
  *     argmin breaks distance ties by cluster index via struct ordering.
  */
object KMeans {

  final case class Model(
      centroids: Array[Array[Double]],
      inertiaPerIter: Seq[BigDecimal])

  /** Squared L2 distance from `vec` to a constant centroid, as one codegen'd
    * fold: aggregate(zip_with(vec, c, (a,b) -> (a-b)²), 0.0, +).
    */
  private def sqDist(vec: Column, centroid: Array[Double]): Column = {
    val c = array(centroid.map(lit): _*)
    aggregate(
      zip_with(vec, c, (a, b) => (a - b) * (a - b)),
      lit(0.0),
      (acc, x) => acc + x)
  }

  /** Cluster assignment for one row: argmin over k distance folds; struct
    * ordering (distance first, then index) makes ties deterministic.
    */
  private def assignExpr(vec: Column, centroids: Array[Array[Double]]): Column =
    array_min(array(centroids.zipWithIndex.map { case (c, j) =>
      struct(sqDist(vec, c).as("d"), lit(j).as("c"))
    }: _*))

  /** Fit k clusters in `iters` Lloyd iterations.
    *
    * @param df     input frame
    * @param idCol  unique id column (drives the deterministic seed)
    * @param vecCol array<float|double> embedding column
    * @param seed   mixed into the init hash so different seeds give
    *               different (but each reproducible) starts
    */
  def fit(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, seed: Long = 42L): Model = {
    require(k > 0 && iters > 0, s"k and iters must be positive, got k=$k iters=$iters")
    val base = df
      .select(col(idCol).cast("long").as("id"), col(vecCol).cast("array<double>").as("vec"))
      .persist()
    try {
      // deterministic seeded init: k smallest by hash — TakeOrderedAndProject,
      // driver receives exactly k rows
      var centroids: Array[Array[Double]] = base
        .orderBy(xxhash64(lit(seed), col("id")), col("id"))
        .limit(k)
        .collect()
        .map(_.getSeq[Double](1).toArray)
      require(centroids.nonEmpty, "input has no rows")

      val inertias = Seq.newBuilder[BigDecimal]
      for (_ <- 1 to iters) {
        val assigned = base.select(col("id"), col("vec"),
          assignExpr(col("vec"), centroids).as("best"))
          .select(col("id"), col("vec"),
            col("best.c").as("cluster"), col("best.d").as("sqdist"))
        // UPDATE + inertia in one pass over the assignment: k·dim partial
        // sums + k counts through the shuffle; k·dim rows to the driver
        val stats = assigned
          .select(col("cluster"), col("sqdist"), posexplode(col("vec")))
          .groupBy(col("cluster"), col("pos"))
          .agg(
            sum(col("col").cast(DecimalType(30, 10))).as("s"),
            count(lit(1)).as("n"),
            // sqdist repeats once per dim within a (cluster,pos) group; pos=0
            // slice carries the true per-cluster inertia sum
            sum(col("sqdist").cast(DecimalType(30, 10))).as("i"))
          .collect()

        val byCluster = stats.groupBy(_.getInt(0))
        centroids = centroids.zipWithIndex.map { case (old, j) =>
          byCluster.get(j) match {
            case Some(rows) =>
              val dim = old.length
              val next = new Array[Double](dim)
              rows.foreach { r =>
                val n = new JBigDecimal(r.getLong(3))
                next(r.getInt(1)) =
                  r.getDecimal(2).divide(n, 10, RoundingMode.HALF_UP).doubleValue()
              }
              next
            case None => old // empty cluster keeps its centroid
          }
        }
        val inertia = stats.filter(_.getInt(1) == 0)
          .map(r => BigDecimal(r.getDecimal(4)))
          .foldLeft(BigDecimal(0))(_ + _)
        inertias += inertia
      }
      Model(centroids, inertias.result())
    } finally {
      base.unpersist()
    }
  }

  /** Final assignment frame for a fitted model: (id, cluster, sqdist). */
  def assign(df: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("vec"))
    base.select(col("id"), assignExpr(col("vec"), model.centroids).as("best"))
      .select(col("id"), col("best.c").as("cluster"), col("best.d").as("sqdist"))
  }
}
