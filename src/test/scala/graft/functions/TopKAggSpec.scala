package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkTestBase {
  import spark.implicits._

  test("TopKAgg equals the window row_number idiom, ties and all") {
    val rng = new scala.util.Random(5)
    val rows = (0L until 500L).map { id =>
      // coarse values force plenty of ties → the id tiebreak must decide
      (s"g${id % 7}", math.floor(rng.nextDouble() * 10) / 2.0, id)
    }
    val df = rows.toDF("grp", "value", "id")
    val topk = udaf(TopKAgg(4))
    val got = df.groupBy($"grp").agg(topk($"value", $"id").as("top"))
      .select($"grp", posexplode($"top"))
      .select($"grp", $"col._1".as("value"), $"col._2".as("id"),
        ($"pos" + 1).as("rnk"))
      .collect().map(r => (r.getString(0), r.getInt(3)) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    val w = Window.partitionBy($"grp").orderBy($"value".desc, $"id".asc)
    val want = df.withColumn("rnk", row_number().over(w)).filter($"rnk" <= 4)
      .collect().map(r => (r.getString(0), r.getInt(3)) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    assert(got == want)
  }

  test("merge is order-insensitive and respects the k bound") {
    val agg = TopKAgg(3)
    val items = Seq((5.0, 1L), (5.0, 0L), (7.0, 9L), (1.0, 2L), (7.0, 3L), (6.0, 4L))
    val (l, r) = items.splitAt(3)
    val b1 = l.foldLeft(agg.zero)(agg.reduce)
    val b2 = r.foldLeft(agg.zero)(agg.reduce)
    val expected = Seq((7.0, 3L), (7.0, 9L), (6.0, 4L))
    assert(agg.merge(b1, b2) == expected)
    assert(agg.merge(b2, b1) == expected)
    assert(agg.merge(b1, b2).size == 3)
    // groups smaller than k just return what they have, in order
    assert(Seq((2.0, 8L)).foldLeft(agg.zero)(agg.reduce) == Seq((2.0, 8L)))
  }

  test("plan does partial aggregation — the shuffle carries k rows per group per task") {
    val df = (0L until 100L).map(i => (s"g${i % 3}", i.toDouble, i)).toDF("grp", "value", "id")
    val topk = udaf(TopKAgg(2))
    val agg = df.groupBy($"grp").agg(topk($"value", $"id").as("top"))
    val plan = agg.queryExecution.executedPlan.toString()
    assert(plan.contains("ObjectHashAggregate") && plan.contains("partial_topkagg"),
      s"expected partial ObjectHashAggregate before the exchange: $plan")
  }
}
