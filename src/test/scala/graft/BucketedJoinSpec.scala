package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Bucketing: pre-shuffling both join sides into the same bucket layout lets
  * the sort-merge join run with zero exchanges — the co-located-join pattern
  * for repeated large joins at 100 TB (SURVEY.md §2 "Partitioning & shuffle").
  */
class BucketedJoinSpec extends SparkTestBase {

  test("join of two tables bucketed on the key plans without a shuffle") {
    val sf = "/root/testdata/sf0.001" // warehouse dir: temp, set in SparkTestBase

    Tables(spark, sf, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    Tables(spark, sf, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    // force the sort-merge path (broadcast would bypass the bucket layout on
    // these test-scale tables) and execute so AQE finalizes the plan
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    val joined =
      try {
        val j = spark.table("lineitem_b")
          .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority")).count()
        j.collect()
        j
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    val plan = joined.queryExecution.executedPlan.toString()
    val joinSection = plan.substring(plan.indexOf("SortMergeJoin") match {
      case -1 => 0
      case i => i
    })
    // no Exchange may feed the join inputs (bucket layout satisfies the
    // required distribution); the only exchange allowed is the final groupBy
    assert(plan.contains("SortMergeJoin"), s"plan: $plan")
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join must not reshuffle its inputs: $plan")

    // and it is the same answer as the unbucketed join
    val expected = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }
}
