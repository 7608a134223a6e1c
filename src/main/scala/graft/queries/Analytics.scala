package graft.queries

import graft.{GraftQuery, QueryPack, Tables}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Window functions (ranking, analytic, frames), global sort/top-k, set
  * operations, sampling (reference `cli/Sample.java:99`). Running/moving sums
  * go through DECIMAL so window accumulation is bit-identical to the oracle.
  */
object Analytics extends QueryPack {

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q15_window_rank_top3_per_brand",
      (s, dir) => {
        val w = Window.partitionBy(col("p_brand"))
          .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
        Tables(s, dir, "part")
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
            col("rnk").cast("long").as("rnk"))
          .orderBy("p_brand", "rnk")
      },
      Some("""SELECT p_brand, p_partkey, p_retailprice, CAST(rnk AS BIGINT) AS rnk
        |FROM (SELECT p_brand, p_partkey, p_retailprice,
        |        row_number() OVER (PARTITION BY p_brand
        |                           ORDER BY p_retailprice DESC, p_partkey) AS rnk
        |      FROM part) t
        |WHERE rnk <= 3 ORDER BY p_brand, rnk""".stripMargin)),

    // q15's semantics via the bounded-heap TopKAgg aggregator instead of a
    // window: partial aggregation keeps ≤3 rows per (brand, map task) so the
    // shuffle never carries the full table — the 100 TB top-k-per-group
    // plan. Shares q15's oracle; results must be bit-identical.
    GraftQuery(
      "q76_topk_per_group_agg",
      (s, dir) => {
        val topk = udaf(graft.functions.TopKAgg(3))
        Tables(s, dir, "part")
          .groupBy(col("p_brand"))
          .agg(topk(col("p_retailprice"), col("p_partkey")).as("top"))
          .select(col("p_brand"), posexplode(col("top")))
          .select(col("p_brand"), col("col._2").as("p_partkey"),
            col("col._1").as("p_retailprice"), (col("pos") + 1).cast("long").as("rnk"))
          .orderBy("p_brand", "rnk")
      },
      Some("""SELECT p_brand, p_partkey, p_retailprice, CAST(rnk AS BIGINT) AS rnk
        |FROM (SELECT p_brand, p_partkey, p_retailprice,
        |        row_number() OVER (PARTITION BY p_brand
        |                           ORDER BY p_retailprice DESC, p_partkey) AS rnk
        |      FROM part) t
        |WHERE rnk <= 3 ORDER BY p_brand, rnk""".stripMargin)),

    // q15's semantics a THIRD way: the custom physical operator
    // (plans.TopKPerGroupExec — bounded per-partition heaps around the group
    // exchange, tier-(c) LogicalPlan+Strategy+SparkPlan). The shuffle carries
    // ≤ k rows per (group, map partition) and nothing is ever sorted beyond
    // the k survivors; rnk is reconstructed by a window over the tiny
    // (k·groups)-row result. Shares q15's oracle; must be bit-identical.
    GraftQuery(
      "q147_topk_custom_plan",
      (s, dir) => {
        val base = Tables(s, dir, "part")
          .select(col("p_brand"), col("p_partkey"), col("p_retailprice"))
        val top = graft.plans.TopKPerGroup(
          base, Seq("p_brand"), Seq(("p_retailprice", false), ("p_partkey", true)), 3)
        val w = Window.partitionBy(col("p_brand"))
          .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
        top.withColumn("rnk", row_number().over(w).cast("long"))
          .orderBy("p_brand", "rnk")
      },
      Some("""SELECT p_brand, p_partkey, p_retailprice, CAST(rnk AS BIGINT) AS rnk
        |FROM (SELECT p_brand, p_partkey, p_retailprice,
        |        row_number() OVER (PARTITION BY p_brand
        |                           ORDER BY p_retailprice DESC, p_partkey) AS rnk
        |      FROM part) t
        |WHERE rnk <= 3 ORDER BY p_brand, rnk""".stripMargin)),

    GraftQuery(
      "q16_window_running_revenue",
      (s, dir) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(s, dir, "lineitem")
          .filter(col("l_suppkey") < 10)
          .withColumn("running_rev", sum(dec2(col("l_extendedprice"))).over(w).cast("double"))
          .select(col("l_suppkey"), col("l_orderkey"),
            col("l_linenumber").cast("long").as("l_linenumber"),
            date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"),
            col("running_rev"))
          .orderBy("l_suppkey", "ship_date", "l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |       OVER (PARTITION BY l_suppkey
        |             ORDER BY l_shipdate, l_orderkey, l_linenumber
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_rev
        |FROM lineitem WHERE l_suppkey < 10
        |ORDER BY l_suppkey, ship_date, l_orderkey, l_linenumber""".stripMargin)),

    GraftQuery(
      "q17_window_moving_avg",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(-4, Window.currentRow)
        Tables(s, dir, "orders")
          .filter(col("o_custkey") < 100)
          .withColumn("mov_sum", sum(dec2(col("o_totalprice"))).over(w).cast("double"))
          .withColumn("mov_n", count(lit(1)).over(w))
          .select(col("o_custkey"), col("o_orderkey"),
            (col("mov_sum") / col("mov_n")).as("mov_avg_price"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |       OVER w AS DOUBLE) / COUNT(*) OVER w AS mov_avg_price
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    GraftQuery(
      "q18_window_lag_lead",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables(s, dir, "orders")
          .filter(col("o_custkey") < 100)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            lag(col("o_totalprice"), 1).over(w).as("prev_price"),
            lead(col("o_totalprice"), 1).over(w).as("next_price"),
            (col("o_totalprice") - lag(col("o_totalprice"), 1).over(w)).as("price_delta"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  o_totalprice - lag(o_totalprice, 1) OVER w AS price_delta
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    GraftQuery(
      "q19_topk_orders",
      (s, dir) => {
        Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(10)
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    GraftQuery(
      "q20_set_union_segments",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
          .union(c.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey")))
          .distinct()
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |ORDER BY c_custkey""".stripMargin)),

    GraftQuery(
      "q21_set_intersect_repeat_buyers",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
          .intersect(o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey")))
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1995
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1996
        |ORDER BY o_custkey""".stripMargin)),

    GraftQuery(
      "q22_set_except_no_1995_order",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val o = Tables(s, dir, "orders")
        c.select(col("c_custkey"))
          .except(o.filter(year(col("o_orderdate")) === 1995)
            .select(col("o_custkey").as("c_custkey")))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1995
        |ORDER BY c_custkey""".stripMargin)),

    // Bernoulli sample (reference `cli/Sample.java:99`): RNG differs across
    // engines, so no SQL oracle — the driver records a rows-only check; exact
    // semantics are pinned in ScalaTest instead.
    GraftQuery(
      "q23_sample_bernoulli",
      (s, dir) => {
        graft.operators.Sampling.bernoulli(
          Tables(s, dir, "lineitem"), fraction = 0.01, seed = 42L)
          .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
            col("l_quantity"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      None),

    // Stratified sample (per-stratum Bernoulli fractions, seeded) — the
    // class-balancing primitive for training-data curation. RNG differs
    // across engines → rows-only; fraction bounds pinned in ScalaTest.
    GraftQuery(
      "q64_sample_stratified",
      (s, dir) => {
        Tables(s, dir, "orders")
          .stat.sampleBy("o_orderpriority",
            fractions = Map(
              "1-URGENT" -> 0.02, "2-HIGH" -> 0.02, "3-MEDIUM" -> 0.01,
              "4-NOT SPECIFIED" -> 0.01, "5-LOW" -> 0.005),
            seed = 42L)
          .select(col("o_orderkey"), col("o_orderpriority"))
          .orderBy("o_orderkey")
      },
      None),

    // HLL approximate distinct: approximate by construction → rows-only check.
    GraftQuery(
      "q24_approx_count_distinct",
      (s, dir) => {
        Tables(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(
            approx_count_distinct(col("user_id")).as("approx_users"),
            count(lit(1)).as("n_events"))
          .orderBy("event_type")
      },
      None)
  )
}
