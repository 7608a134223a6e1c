package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class DistributedPrefixSumSpec extends SparkTestBase {
  import spark.implicits._

  test("matches the single-partition window scan on a seeded random frame") {
    val rng = new scala.util.Random(42)
    val rows = (1 to 500).map(i => (i.toLong, rng.nextInt(1000).toLong,
      rng.nextInt(100).toLong))
    val df = rows.toDF("id", "key", "v")
      .repartition(7) // scramble input layout so the range shuffle has work
    val got = DistributedPrefixSum
      .scan(df, Seq("key", "id"), Seq("v"))
      .select($"id", $"global_idx", $"run_v")
      .as[(Long, Long, Long)].collect().sortBy(_._1)

    val w = Window.orderBy($"key", $"id")
    val want = rows.toDF("id", "key", "v")
      .withColumn("global_idx", row_number().over(w).cast("long"))
      .withColumn("run_v",
        sum($"v").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select($"id", $"global_idx", $"run_v")
      .as[(Long, Long, Long)].collect().sortBy(_._1)

    assert(got.toSeq == want.toSeq)
  }

  test("multiple value columns accumulate independently; nulls count as 0") {
    val df = Seq(
      (1L, Some(10L), Some(1L)),
      (2L, None, Some(2L)),
      (3L, Some(30L), None),
      (4L, Some(40L), Some(4L))
    ).toDF("k", "a", "b")
    val got = DistributedPrefixSum.scan(df, Seq("k"), Seq("a", "b"))
      .select($"k", $"global_idx", $"run_a", $"run_b")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 1L, 10L, 1L), (2L, 2L, 10L, 3L),
      (3L, 3L, 40L, 3L), (4L, 4L, 80L, 7L)))
  }

  test("empty input returns an empty frame with the scan columns appended") {
    val df = Seq.empty[(Long, Long)].toDF("k", "v")
    val out = DistributedPrefixSum.scan(df, Seq("k"), Seq("v"))
    assert(out.columns.toSeq == Seq("k", "v", "global_idx", "run_v"))
    assert(out.count() == 0)
  }

  test("lag matches the single-partition window lag on a seeded random frame") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 500).map(i =>
      (i.toLong, rng.nextInt(50).toLong, s"s${rng.nextInt(1000)}"))
    val df = rows.toDF("id", "key", "s").repartition(9)
    val got = DistributedPrefixSum
      .lag(df, Seq("key", "id"), Seq("s", "key"))
      .select($"id", $"lag_s", $"lag_key")
      .as[(Long, Option[String], Option[Long])].collect().sortBy(_._1)

    val w = Window.orderBy($"key", $"id")
    val want = rows.toDF("id", "key", "s")
      .withColumn("lag_s", lag($"s", 1).over(w))
      .withColumn("lag_key", lag($"key", 1).over(w))
      .select($"id", $"lag_s", $"lag_key")
      .as[(Long, Option[String], Option[Long])].collect().sortBy(_._1)

    assert(got.toSeq == want.toSeq)
    assert(want.count(_._2.isEmpty) == 1) // exactly the global first row
  }

  test("lag on empty input keeps schema; single row lags to null") {
    val empty = DistributedPrefixSum.lag(
      Seq.empty[(Long, String)].toDF("k", "s"), Seq("k"), Seq("s"))
    assert(empty.columns.toSeq == Seq("k", "s", "lag_s"))
    assert(empty.count() == 0)
    val one = DistributedPrefixSum.lag(
      Seq((1L, "x")).toDF("k", "s"), Seq("k"), Seq("s"))
      .select($"lag_s").as[Option[String]].collect()
    assert(one.toSeq == Seq(None))
  }

  test("scanWithTotals reports grand totals; ntileFromIndex matches ntile()") {
    for (n <- Seq(1, 9, 10, 11, 500); k <- Seq(1, 3, 10)) {
      val rng = new scala.util.Random(n * 31 + k)
      val rows = (1 to n).map(i => (i.toLong, rng.nextInt(100).toLong))
      val df = rows.toDF("id", "v").repartition(5)
      val res = DistributedPrefixSum.scanWithTotals(df, Seq("v", "id"), Seq("v"))
      assert(res.totalCount == n.toLong)
      assert(res.totalSums("v") == rows.map(_._2).sum)
      val got = res.df
        .select($"id",
          DistributedPrefixSum.ntileFromIndex(k, "global_idx", res.totalCount)
            .as("b"))
        .as[(Long, Long)].collect().sortBy(_._1)
      val w = Window.orderBy($"v", $"id")
      val want = rows.toDF("id", "v")
        .withColumn("b", ntile(k).over(w).cast("long"))
        .select($"id", $"b").as[(Long, Long)].collect().sortBy(_._1)
      assert(got.toSeq == want.toSeq, s"n=$n k=$k")
    }
  }

  test("rejects non-BIGINT value columns and clashing output names") {
    val df = Seq((1L, 1.5)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      DistributedPrefixSum.scan(df, Seq("k"), Seq("v"))
    }
    val df2 = Seq((1L, 2L, 3L)).toDF("k", "v", "global_idx")
    intercept[IllegalArgumentException] {
      DistributedPrefixSum.scan(df2, Seq("k"), Seq("v"))
    }
  }
}
