package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class SequentialFoldSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("EMA fold matches a hand-computed recurrence") {
    val df = Seq(
      (1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 30.0), // 10 → 12 → 15.6
      (2L, 1L, 5.0)                                   // single row: seed only
    ).toDF("k", "o", "v")
    val got = SequentialFold.ema(df, "k", Seq("o"), "v", alpha = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val expected = 0.2 * 30.0 + 0.8 * (0.2 * 20.0 + 0.8 * 10.0) // IEEE, not 15.6
    assert(got.toSeq == Seq((1L, 3L, expected), (2L, 1L, 5.0)),
      s"fold: ${got.toSeq}")
  }

  test("secondary-sort fold equals the collect_list+aggregate HOF twin, any partitioning") {
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), expr("ts div 1000").as("us"), col("event_id"), col("value"))
    val viaFold = SequentialFold.ema(ev, "user_id", Seq("us", "event_id"), "value", 0.2)
      .select(col("user_id"), col("n_rows"), col("ema"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    // independent implementation: materialize each sequence, fold with the
    // same IEEE expression — must be bit-identical (no rounding tolerance)
    val viaHof = ev
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_rows"),
        expr("transform(array_sort(collect_list(struct(us, event_id, value))), s -> s.value)")
          .as("xs"))
      .select(col("user_id"), col("n_rows"),
        expr("""aggregate(slice(xs, 2, greatest(size(xs) - 1, 0)),
          CAST(xs[0] AS DOUBLE), (acc, x) -> 0.2D * x + 0.8D * acc)""").as("ema"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(viaFold.length == viaHof.length && viaFold.length > 0)
    viaFold.zip(viaHof).foreach { case (a, b) =>
      assert(a == b, s"fold $a != hof twin $b (must be bit-identical)")
    }
    // scatter the input: per-key result must not depend on partitioning
    val scattered = SequentialFold
      .ema(ev.repartition(13), "user_id", Seq("us", "event_id"), "value", 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(scattered.toSeq == viaFold.toSeq)
  }

  test("holt matches a local two-state fold bit-identically, any partitioning") {
    val rng = new scala.util.Random(19)
    val rows = for (k <- 1L to 20L; i <- 1 to rng.nextInt(30) + 1)
      yield (k, i.toLong, rng.nextDouble() * 100.0)
    val df = spark.createDataFrame(rows).toDF("k", "ord", "v").repartition(9)
    val got = SequentialFold.holt(df, "k", Seq("ord"), "v", alpha = 0.3, beta = 0.1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (k, g) =>
      val xs = g.sortBy(_._2).map(_._3)
      var l = xs.head
      var b = 0.0
      xs.tail.foreach { x =>
        val ln = 0.3 * x + 0.7 * (l + b)
        b = 0.1 * (ln - l) + 0.9 * b
        l = ln
      }
      (k, xs.size.toLong, l, b, l + b)
    }
    assert(got.toSeq == want) // bit-identical, no tolerance
  }

  test("plan: one exchange (the key repartition), sort stays partition-local") {
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), expr("ts div 1000").as("us"), col("event_id"), col("value"))
    val df = SequentialFold.ema(ev, "user_id", Seq("us", "event_id"), "value", 0.2)
    df.collect()
    val p = df.queryExecution.executedPlan.toString()
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(_.contains("hashpartitioning(user_id")),
      s"only the key repartition may shuffle:\n$p")
    val sorts = p.linesIterator.filter(_.trim.startsWith("+- Sort")).toSeq
    assert(sorts.forall(_.contains("false, 0")), // global=false
      s"sort must be partition-local (secondary sort), not global:\n$p")
  }
}
