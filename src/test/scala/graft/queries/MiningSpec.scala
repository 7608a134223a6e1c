package graft.queries

import graft.SparkTestBase
import graft.operators.BruteForceCosine
import org.apache.spark.sql.functions._

/** Pins for the round-6 mining surface: hard-negative semantics vs a naive
  * recomputation, and the windowed skyline vs the O(n²) dominance
  * definition it replaces.
  */
class MiningSpec extends SparkTestBase {
  import spark.implicits._

  test("hardNegatives: every result has a different label and matches brute-force ranking") {
    // 3 clusters along axes; ids 0..8, labels 0/1/2
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.1f, 0.0f), 0),
      (2L, Array(0.8f, 0.2f, 0.0f), 1), // near label-0 cluster, different label
      (3L, Array(0.0f, 1.0f, 0.0f), 1),
      (4L, Array(0.1f, 0.9f, 0.0f), 1),
      (5L, Array(0.0f, 0.8f, 0.2f), 2), // near label-1 cluster, different label
      (6L, Array(0.0f, 0.0f, 1.0f), 2),
      (7L, Array(0.2f, 0.0f, 0.8f), 0)
    ).toDF("vec_id", "embedding", "label")

    val got = BruteForceCosine
      .hardNegatives(vecs, "vec_id", "embedding", "label", col("vec_id") < 2, k = 2)
      .select("query_id", "qlabel", "neighbor_id", "nlabel", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .toSet

    // labels always differ
    assert(got.forall { case (_, ql, _, nl, _) => ql != nl })
    // brute force: for query 0 (label 0), nearest different-label ids are 2
    // (cos≈0.970) then 4 (cos≈0.110) over {2,3,4,5,6}; for query 1 the same
    // top-2 by direct computation
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / math.sqrt(a.map(x => x.toDouble * x).sum * b.map(x => x.toDouble * x).sum)
    }
    val raw = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0), (1L, Array(0.9f, 0.1f, 0.0f), 0),
      (2L, Array(0.8f, 0.2f, 0.0f), 1), (3L, Array(0.0f, 1.0f, 0.0f), 1),
      (4L, Array(0.1f, 0.9f, 0.0f), 1), (5L, Array(0.0f, 0.8f, 0.2f), 2),
      (6L, Array(0.0f, 0.0f, 1.0f), 2), (7L, Array(0.2f, 0.0f, 0.8f), 0))
    for (q <- raw.filter(_._1 < 2)) {
      val expect = raw.filter(o => o._1 != q._1 && o._3 != q._3)
        .map(o => (o._1, cos(q._2, o._2)))
        .sortBy { case (id, s) => (-s, id) }.take(2).map(_._1)
      val mine = got.toSeq.filter(_._1 == q._1).sortBy(_._5).map(_._3)
      assert(mine == expect, s"query ${q._1}: got $mine expected $expect")
    }
  }

  test("skyline window formulation equals the O(n^2) dominance definition") {
    // (day, day_max): a day is in the skyline iff no earlier-or-equal day
    // has a >= max with at least one strict — for distinct days that is
    // exactly "beats every strictly earlier day"
    val days = Seq((1L, 10.0), (2L, 7.0), (3L, 12.0), (4L, 12.0), (5L, 15.0), (6L, 3.0))
    val expected = days.filter { case (d, m) =>
      days.forall { case (d2, m2) => !(d2 < d && m2 >= m) }
    }.map(_._1).toSet
    assert(expected == Set(1L, 3L, 5L))

    val df = days.toDF("day", "day_max")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("day").rowsBetween(Long.MinValue, -1)
    val got = df.withColumn("prior_max", max(col("day_max")).over(w))
      .filter(col("prior_max").isNull || col("day_max") > col("prior_max"))
      .select("day").as[Long].collect().toSet
    assert(got == expected)
  }
}
