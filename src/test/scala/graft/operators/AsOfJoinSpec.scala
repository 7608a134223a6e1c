package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("as-of join attaches latest prior right row per key, left-outer") {
    val left = Seq(
      (1L, 100L, "e1"), // key 1 at t=100
      (1L, 55L, "e2"),  // key 1 at t=55
      (2L, 10L, "e3"),  // key 2 at t=10 → no prior right row
      (3L, 70L, "e4")   // key 3 → no right rows at all
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 50L, 501L, 5.0),
      (1L, 90L, 502L, 9.0),
      (1L, 100L, 503L, 10.0), // equal time counts as prior (<=)
      (2L, 20L, 504L, 2.0)    // after left's t=10
    ).toDF("k", "t", "rid", "v")

    val out = AsOfJoin(
      left, col("k"), col("t"),
      right.withColumnRenamed("k", "rk").withColumnRenamed("t", "rt"),
      col("rk"), col("rt"), tiebreak = col("rid"),
      payload = Seq("rid", "v"))
      .select("tag", "rid", "v").collect()
      .map(r => r.getString(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap

    assert(out("e1") == ((Some(503L), Some(10.0)))) // t=100: rid 503 at rt=100
    assert(out("e2") == ((Some(501L), Some(5.0))))  // t=55: rid 501 at rt=50
    assert(out("e3") == ((None, None)))             // nothing at or before t=10
    assert(out("e4") == ((None, None)))             // key never on right
  }

  test("tiebreak picks the highest tiebreak among equal times; null fields don't tear") {
    val left = Seq((1L, 100L, "e")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 90L, 1L, Some(1.0)),
      (1L, 90L, 2L, None: Option[Double]) // later tiebreak, NULL v — must win whole
    ).toDF("k", "rt", "rid", "v")
    val out = AsOfJoin(left, col("k"), col("t"),
      right.withColumnRenamed("k", "rk"), col("rk"), col("rt"),
      tiebreak = col("rid"), payload = Seq("rid", "v")).collect()(0)
    assert(out.getAs[Long]("rid") == 2L)
    assert(out.isNullAt(out.fieldIndex("v")), "struct payload must not tear fields")
  }
}
