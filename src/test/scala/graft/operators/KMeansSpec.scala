package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkTestBase {
  import spark.implicits._

  private def toyDf = Seq(
    // two tight clusters around (0,0) and (10,10), plus one outlier
    (1L, Seq(0.0, 0.1)), (2L, Seq(0.1, 0.0)), (3L, Seq(-0.1, 0.1)),
    (4L, Seq(10.0, 10.1)), (5L, Seq(10.1, 9.9)), (6L, Seq(9.9, 10.0)),
    (7L, Seq(5.0, 5.0)))
    .toDF("id", "vec")

  test("separates well-separated clusters and matches a naive driver-side Lloyd run") {
    val model = KMeans.fit(toyDf, "id", "vec", k = 2, iters = 4)
    val assigned = KMeans.assign(toyDf, "id", "vec", model)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // points 1-3 together, 4-6 together, in different clusters
    assert(assigned(1L) == assigned(2L) && assigned(2L) == assigned(3L))
    assert(assigned(4L) == assigned(5L) && assigned(5L) == assigned(6L))
    assert(assigned(1L) != assigned(4L))

    // naive reference with the same deterministic init (2 smallest hashes)
    val data = toyDf.select(col("id"), col("vec"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val initIds = toyDf
      .select(col("id"), md5(concat_ws(":", lit(42L), col("id"))).as("h"))
      .orderBy("h", "id").limit(2).collect().map(_.getLong(0))
    var cents = initIds.map(data)
    for (_ <- 1 to 4) {
      val byC = data.toSeq.groupBy { case (_, v) =>
        cents.zipWithIndex.minBy { case (c, j) =>
          (c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum, j)
        }._2
      }
      cents = cents.zipWithIndex.map { case (old, j) =>
        byC.get(j) match {
          case Some(pts) =>
            val n = pts.size
            old.indices.map(d => pts.map(_._2(d)).sum / n).toArray
          case None => old
        }
      }
    }
    model.centroids.zip(cents).foreach { case (got, want) =>
      got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-6) }
    }
  }

  test("is deterministic across runs and inertia never increases") {
    val a = KMeans.fit(toyDf, "id", "vec", k = 3, iters = 5)
    val b = KMeans.fit(toyDf, "id", "vec", k = 3, iters = 5)
    assert(a.centroids.map(_.toSeq).toSeq == b.centroids.map(_.toSeq).toSeq)
    assert(a.inertiaPerIter == b.inertiaPerIter)
    a.inertiaPerIter.sliding(2).foreach {
      case Seq(prev, next) => assert(next <= prev, s"inertia rose: $prev -> $next")
      case _ =>
    }
  }

  test("different seeds give different (but each reproducible) inits") {
    val a = KMeans.fit(toyDf, "id", "vec", k = 2, iters = 1, seed = 1L)
    val b = KMeans.fit(toyDf, "id", "vec", k = 2, iters = 1, seed = 2L)
    val a2 = KMeans.fit(toyDf, "id", "vec", k = 2, iters = 1, seed = 1L)
    assert(a.centroids.map(_.toSeq).toSeq == a2.centroids.map(_.toSeq).toSeq)
    // seeds draw different init rows on this data (hash order differs)
    assert(a.inertiaPerIter != b.inertiaPerIter ||
      a.centroids.map(_.toSeq).toSeq != b.centroids.map(_.toSeq).toSeq)
  }

  test("driver tail is bit-identical to the distributed loop") {
    // same data, same seed: default (driver-tail) path vs forced
    // distributed path — centroids bitwise, inertia decimals equal; the
    // contract that makes driverMaxCells a pure performance knob
    val tail = KMeans.fit(toyDf, "id", "vec", k = 3, iters = 5)
    val dist = KMeans.fit(toyDf, "id", "vec", k = 3, iters = 5, driverMaxCells = 0L)
    assert(tail.centroids.length == dist.centroids.length)
    tail.centroids.zip(dist.centroids).foreach { case (t, d) =>
      assert(t.toSeq == d.toSeq, s"centroid diverged: ${t.toSeq} vs ${d.toSeq}")
    }
    assert(tail.inertiaPerIter == dist.inertiaPerIter,
      s"inertia diverged: ${tail.inertiaPerIter} vs ${dist.inertiaPerIter}")
  }

  test("k larger than distinct points keeps empty clusters at their init centroid") {
    val tiny = Seq((1L, Seq(0.0, 0.0)), (2L, Seq(1.0, 1.0))).toDF("id", "vec")
    val model = KMeans.fit(tiny, "id", "vec", k = 2, iters = 3)
    assert(model.centroids.length == 2)
    val sizes = KMeans.assign(tiny, "id", "vec", model)
      .groupBy("cluster").count().collect().map(_.getLong(1))
    assert(sizes.sum == 2)
  }
}
