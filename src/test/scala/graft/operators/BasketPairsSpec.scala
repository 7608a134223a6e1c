package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BasketPairs must reproduce EXACTLY the multiset the self-join phrasings
  * it replaces produce — pairs/triples per basket, multiplicity included —
  * on random baskets with duplicates, empties, and singletons.
  */
class BasketPairsSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  // baskets with duplicates (multi-set grain) over a small value domain so
  // collisions and duplicate values actually occur
  private val rows: Seq[(Long, Long)] = (1L to 40L).flatMap { k =>
    val n = rnd.nextInt(8) // 0..7 items, incl. empty baskets (absent keys)
    Seq.fill(n)((k, rnd.nextInt(9).toLong))
  }

  test("explodePairsMulti == the a.v < b.v self-join multiset (duplicates and all)") {
    val df = rows.toDF("k", "v")
    val selfJoin = df.as("a").join(df.as("b"), $"a.k" === $"b.k" && $"a.v" < $"b.v")
      .groupBy($"a.v".as("p1"), $"b.v".as("p2")).count()
    val expanded = BasketPairs.explodePairsMulti(
      df.groupBy($"k").agg(collect_list($"v").as("ps")), "ps")
      .groupBy($"p1", $"p2").count()
    val l = selfJoin.orderBy("p1", "p2").collect().toSeq
    val r = expanded.orderBy("p1", "p2").collect().toSeq
    assert(l == r, s"self-join=$l expansion=$r")
  }

  test("explodePairsMulti survives repartitioned input unchanged") {
    val df = rows.toDF("k", "v").repartition(7)
    val selfJoin = df.as("a").join(df.as("b"), $"a.k" === $"b.k" && $"a.v" < $"b.v")
      .groupBy($"a.v".as("p1"), $"b.v".as("p2")).count()
    val expanded = BasketPairs.explodePairsMulti(
      df.groupBy($"k").agg(collect_list($"v").as("ps")), "ps")
      .groupBy($"p1", $"p2").count()
    assert(selfJoin.orderBy("p1", "p2").collect().toSeq ==
      expanded.orderBy("p1", "p2").collect().toSeq)
  }

  test("explodePairsDistinct / explodeTriplesDistinct == the distinct-frame self-joins") {
    val d = rows.toDF("k", "v").distinct()
    val sets = d.groupBy($"k").agg(collect_set($"v").as("ps"))
    val jPairs = d.as("a").join(d.as("b"), $"a.k" === $"b.k" && $"a.v" < $"b.v")
      .groupBy($"a.v".as("p1"), $"b.v".as("p2")).count()
      .orderBy("p1", "p2").collect().toSeq
    val ePairs = BasketPairs.explodePairsDistinct(sets, "ps")
      .groupBy($"p1", $"p2").count()
      .orderBy("p1", "p2").collect().toSeq
    assert(jPairs == ePairs)
    val jTriples = d.as("a")
      .join(d.as("b"), $"a.k" === $"b.k" && $"a.v" < $"b.v")
      .join(d.as("c"), $"a.k" === $"c.k" && $"b.v" < $"c.v")
      .groupBy($"a.v".as("b1"), $"b.v".as("b2"), $"c.v".as("b3")).count()
      .orderBy("b1", "b2", "b3").collect().toSeq
    val eTriples = BasketPairs.explodeTriplesDistinct(sets, "ps")
      .groupBy($"b1", $"b2", $"b3").count()
      .orderBy("b1", "b2", "b3").collect().toSeq
    assert(jTriples == eTriples)
  }

  test("string elements (the brand-grain callers) expand identically") {
    val d = rows.map { case (k, v) => (k, s"B$v") }.toDF("k", "v").distinct()
    val sets = d.groupBy($"k").agg(collect_set($"v").as("ps"))
    val jPairs = d.as("a").join(d.as("b"), $"a.k" === $"b.k" && $"a.v" < $"b.v")
      .groupBy($"a.v".as("p1"), $"b.v".as("p2")).count()
      .orderBy("p1", "p2").collect().toSeq
    val ePairs = BasketPairs.explodePairsDistinct(sets, "ps")
      .groupBy($"p1", $"p2").count()
      .orderBy("p1", "p2").collect().toSeq
    assert(jPairs == ePairs)
    val jTriples = d.as("a")
      .join(d.as("b"), $"a.k" === $"b.k" && $"a.v" < $"b.v")
      .join(d.as("c"), $"a.k" === $"c.k" && $"b.v" < $"c.v")
      .groupBy($"a.v".as("b1"), $"b.v".as("b2"), $"c.v".as("b3")).count()
      .orderBy("b1", "b2", "b3").collect().toSeq
    val eTriples = BasketPairs.explodeTriplesDistinct(sets, "ps")
      .groupBy($"b1", $"b2", $"b3").count()
      .orderBy("b1", "b2", "b3").collect().toSeq
    assert(jTriples == eTriples)
  }

  test("the expansion stays codegen: no CodegenFallback expressions in the plan") {
    val df = rows.toDF("k", "v")
    val plan = BasketPairs.explodePairsMulti(
      df.groupBy($"k").agg(collect_list($"v").as("ps")), "ps")
      .queryExecution.executedPlan
    val fallbacks = plan.collect {
      case p => p.expressions.flatMap(_.collect {
        case e: org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
            if !e.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Unevaluable] => e
      })
    }.flatten
    assert(fallbacks.isEmpty, s"interpreted expressions in hot path: $fallbacks")
  }
}
