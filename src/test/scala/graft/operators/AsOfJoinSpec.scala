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

  test("forward / nearest / tolerance match a brute-force as-of over random data") {
    val rng = new scala.util.Random(17)
    val left = (0 until 200).map(i => (rng.nextInt(5).toLong, rng.nextInt(1000).toLong, i))
    val right = (0 until 300).map(i => (rng.nextInt(5).toLong, rng.nextInt(1000).toLong, i.toLong))
    val lDf = left.toDF("k", "t", "tag")
    val rDf = right.toDF("rk", "rt", "rid")

    def brute(dir: String, tol: Option[Long]): Map[Int, Option[Long]] =
      left.map { case (k, t, tag) =>
        val cands = right.filter(_._1 == k)
        val back = cands.filter(_._2 <= t).sortBy(c => (c._2, c._3)).lastOption
        val fwd = cands.filter(_._2 >= t).sortBy(c => (-c._2, -c._3)).lastOption
        def ok(c: (Long, Long, Long)) = tol.forall(w => math.abs(c._2 - t) <= w)
        val pick = dir match {
          case "backward" => back.filter(ok)
          case "forward" => fwd.filter(ok)
          case "nearest" =>
            val b = back.filter(ok); val f = fwd.filter(ok)
            (b, f) match {
              case (Some(bb), Some(ff)) =>
                if (ff._2 - t < t - bb._2) Some(ff) else Some(bb) // tie → backward
              case _ => b.orElse(f)
            }
        }
        tag -> pick.map(_._3)
      }.toMap

    for (dir <- Seq("backward", "forward", "nearest");
         tol <- Seq(None, Some(50L))) {
      val within = tol.map(w => (lt: org.apache.spark.sql.Column,
        mt: org.apache.spark.sql.Column) =>
        mt - lt <= lit(w) && lt - mt <= lit(w))
      val got = AsOfJoin(lDf, col("k"), col("t"), rDf, col("rk"), col("rt"),
        tiebreak = col("rid"), payload = Seq("rid"),
        direction = dir, within = within)
        .select("tag", "rid").collect()
        .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(got == brute(dir, tol), s"direction=$dir tolerance=$tol")
    }
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
