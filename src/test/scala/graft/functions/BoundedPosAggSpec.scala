package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BoundedPosAgg: count always exact; positions complete iff count <= cap,
  * dropped (null) past the cap — regardless of partitioning (sticky
  * overflow through partial/merge).
  */
class BoundedPosAggSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(String, Long)], cap: Int, parts: Int) = {
    val agg = udaf(BoundedPosAgg(cap))
    rows.toDF("f", "pos").repartition(parts)
      .groupBy($"f").agg(agg($"pos").as("cp"))
      .select($"f", $"cp._1".as("n"), $"cp._2".as("pos"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getSeq[Long](2).sorted)))
      .toMap
  }

  test("under the cap: exact count and the complete position set") {
    val rows = (1L to 100L).map(i => ("a", i)) ++ (1L to 5L).map(i => ("b", i * 7))
    for (parts <- Seq(1, 7)) {
      val m = run(rows, cap = 100, parts)
      assert(m("a") == (100L, Some((1L to 100L).toSeq)))
      assert(m("b") == (5L, Some(Seq(7L, 14L, 21L, 28L, 35L))))
    }
  }

  test("over the cap: count keeps counting, positions drop to null") {
    val rows = (1L to 101L).map(i => ("a", i))
    for (parts <- Seq(1, 13)) {
      val m = run(rows, cap = 100, parts)
      assert(m("a") == (101L, None), s"parts=$parts: ${m("a")}")
    }
  }

  test("boundary: exactly cap positions are kept") {
    val m = run((1L to 64L).map(i => ("a", i)), cap = 64, parts = 5)
    assert(m("a") == (64L, Some((1L to 64L).toSeq)))
  }
}
