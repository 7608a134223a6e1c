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
  *   - init picks the k rows with the smallest seeded `md5(seed:id)` via
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

  /** Driver-tail bound in CELLS (rows × dim), the KCore / ConnectedComponents
    * / PageRank / ShortestPaths pattern applied to the last iterative
    * operator: embedding sets small enough to collect run their Lloyd
    * iterations in driver arrays — the SAME decimal-exact recurrence, so the
    * model is bit-identical (pinned in KMeansSpec) — instead of one
    * shuffle+collect job per iteration. The distributed loop stays the scale
    * path; 2M cells ≈ 16 MB of doubles.
    */
  val DefaultDriverMaxCells: Long = 2000000L

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
    * @param driverMaxCells iterate in driver memory when rows × dim fits
    *               this bound (`0` forces the distributed loop — the 100 TB
    *               shape, and the spec's equality pin); init is distributed
    *               either way, so the seeded hash order never moves
    */
  def fit(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, seed: Long = 42L,
      driverMaxCells: Long = DefaultDriverMaxCells): Model = {
    require(k > 0 && iters > 0, s"k and iters must be positive, got k=$k iters=$iters")
    val base = df
      .select(col(idCol).cast("long").as("id"), col(vecCol).cast("array<double>").as("vec"))
      .persist()
    try {
      // deterministic seeded init: k smallest by hash — TakeOrderedAndProject,
      // driver receives exactly k rows. md5 (not xxhash64) keeps the pick
      // ENGINE-PORTABLE — the same uniform no-count draw, replayable in
      // the DuckDB oracle (the IvfIndex q59 precedent)
      var centroids: Array[Array[Double]] = base
        .orderBy(md5(concat_ws(":", lit(seed), col("id"))), col("id"))
        .limit(k)
        .collect()
        .map(_.getSeq[Double](1).toArray)
      require(centroids.nonEmpty, "input has no rows")

      // driver tail: one limit-probe collect on the cached base — if the
      // whole vector set fits the cell bound (and is clean: no nulls, no
      // non-finite components, uniform dim), the per-iteration
      // assign+aggregate jobs below would only burn scheduler latency on
      // it. Malformed inputs fall through so both paths share ONE
      // degenerate-data behavior (the distributed plan's).
      val dim = centroids.head.length
      if (driverMaxCells > 0 && dim > 0) {
        val maxRows = math.min(driverMaxCells / dim, Int.MaxValue - 1L).toInt
        val probe = base.select(col("vec")).limit(maxRows + 1).collect()
        if (probe.length <= maxRows) {
          val vecs = new Array[Array[Double]](probe.length)
          var clean = true
          var i = 0
          while (clean && i < probe.length) {
            if (probe(i).isNullAt(0)) clean = false
            else {
              val s = probe(i).getSeq[Any](0)
              if (s.length != dim || s.exists(v => v == null ||
                  !java.lang.Double.isFinite(v.asInstanceOf[Double]))) clean = false
              else vecs(i) = s.map(_.asInstanceOf[Double]).toArray
            }
            i += 1
          }
          if (clean) return driverFit(vecs, centroids, iters)
        }
      }

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

  /** Spark's `CAST(double AS DECIMAL(30,10))`: shortest-decimal
    * representation (`BigDecimal.valueOf` = `Double.toString`), then
    * HALF_UP to scale 10 — the exact conversion the distributed
    * aggregation applies per value, so driver sums match bit for bit.
    */
  private def dec10(x: Double): JBigDecimal =
    JBigDecimal.valueOf(x).setScale(10, RoundingMode.HALF_UP)

  /** Left-to-right squared-distance fold — the same association order as
    * the codegen'd `aggregate(zip_with(...))`, so the doubles agree bitwise.
    */
  private def sqDistDriver(v: Array[Double], c: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < v.length) { val d = v(i) - c(i); acc = acc + d * d; i += 1 }
    acc
  }

  /** The same Lloyd recurrence over the collected vectors: argmin by
    * `java.lang.Double.compare` (Spark's double ordering — NaN greatest)
    * with index tie-break, component/inertia sums as exact scale-10
    * decimals (order-free, so per-row accumulation ≡ the shuffle's
    * partial+final grouping), division at the same fixed scale. Bounded by
    * the caller's `driverMaxCells` probe; equality with the distributed
    * loop is pinned in KMeansSpec.
    */
  private def driverFit(vecs: Array[Array[Double]],
      init: Array[Array[Double]], iters: Int): Model = {
    var centroids = init
    val k = centroids.length
    val inertias = Seq.newBuilder[BigDecimal]
    for (_ <- 1 to iters) {
      val dim = centroids.head.length
      val sums = Array.fill(k, dim)(JBigDecimal.ZERO)
      val counts = new Array[Long](k)
      val inertiaByCluster = Array.fill(k)(JBigDecimal.ZERO)
      var r = 0
      while (r < vecs.length) {
        val v = vecs(r)
        var bestJ = 0
        var bestD = sqDistDriver(v, centroids(0))
        var j = 1
        while (j < k) {
          val d = sqDistDriver(v, centroids(j))
          if (java.lang.Double.compare(d, bestD) < 0) { bestD = d; bestJ = j }
          j += 1
        }
        counts(bestJ) += 1
        var p = 0
        while (p < dim) { sums(bestJ)(p) = sums(bestJ)(p).add(dec10(v(p))); p += 1 }
        inertiaByCluster(bestJ) = inertiaByCluster(bestJ).add(dec10(bestD))
        r += 1
      }
      centroids = centroids.zipWithIndex.map { case (old, j) =>
        if (counts(j) == 0L) old // empty cluster keeps its centroid
        else {
          val n = new JBigDecimal(counts(j))
          Array.tabulate(old.length)(p =>
            sums(j)(p).divide(n, 10, RoundingMode.HALF_UP).doubleValue())
        }
      }
      // exact decimal addition is associative: per-cluster subtotals folded
      // here equal the distributed pos==0 slice's fold, any order
      val inertia = (0 until k).filter(counts(_) > 0L)
        .map(j => BigDecimal(inertiaByCluster(j)))
        .foldLeft(BigDecimal(0))(_ + _)
      inertias += inertia
    }
    Model(centroids, inertias.result())
  }

  /** Final assignment frame for a fitted model: (id, cluster, sqdist). */
  def assign(df: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("vec"))
    base.select(col("id"), assignExpr(col("vec"), model.centroids).as("best"))
      .select(col("id"), col("best.c").as("cluster"), col("best.d").as("sqdist"))
  }
}
