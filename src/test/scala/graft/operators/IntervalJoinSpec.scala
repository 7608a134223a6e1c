package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("containment matches the naive cross join on seeded random data") {
    val rng = new scala.util.Random(7)
    val pts = (1 to 200).map(i => (i.toLong, rng.nextInt(1000).toLong))
      .toDF("pid", "p")
    val ivs = (1 to 80).map { i =>
      val s = rng.nextInt(950).toLong; (i.toLong, s, s + rng.nextInt(60))
    }.toDF("iid", "s", "e")

    for (w <- Seq(1L, 7L, 64L, 2000L)) {
      val got = IntervalJoin.containment(pts, "p", ivs, "s", "e", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      val want = pts.crossJoin(ivs)
        .where($"p" >= $"s" && $"p" <= $"e")
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == want, s"binWidth=$w")
    }
  }

  test("overlap matches the naive cross join, duplicate-free, with equi keys") {
    val rng = new scala.util.Random(11)
    def mk(n: Int, prefix: String) = (1 to n).map { i =>
      val s = rng.nextInt(500).toLong
      (i.toLong, rng.nextInt(5).toLong, s, s + rng.nextInt(40))
    }.toDF(prefix + "id", prefix + "k", prefix + "s", prefix + "e")
    val a = mk(120, "a")
    val b = mk(120, "b")

    for (w <- Seq(1L, 8L, 41L, 1000L)) {
      val got = IntervalJoin
        .overlap(a, "as", "ae", b, "bs", "be", Seq("ak" -> "bk"), w)
        .select("aid", "bid").as[(Long, Long)].collect().toSeq
      // duplicate-free without distinct
      assert(got.size == got.toSet.size, s"binWidth=$w emitted duplicates")
      val want = a.crossJoin(b)
        .where($"ak" === $"bk" && $"as" <= $"be" && $"bs" <= $"ae")
        .select("aid", "bid").as[(Long, Long)].collect().toSet
      assert(got.toSet == want, s"binWidth=$w")
    }
  }

  test("overlap filters out-of-domain rows instead of mis-binning them") {
    val a = Seq((1L, -5L, 10L), (2L, 3L, 2L), (3L, 0L, 4L)).toDF("aid", "as", "ae")
    val b = Seq((9L, 1L, 6L)).toDF("bid", "bs", "be")
    val got = IntervalJoin.overlap(a, "as", "ae", b, "bs", "be", Nil, 4L)
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    // aid=1 (negative start) and aid=2 (inverted) are dropped; aid=3 overlaps
    assert(got == Set((3L, 9L)))
  }
}
