package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Invariant pins for the round-7 surface (q115–q124). The hash-level
  * verification is the DuckDB oracle (including the recursive-CTE oracles
  * for BFS and connected components); these tests pin the *structural*
  * properties a hash can't explain when it breaks.
  */
class GraphQualitySpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q115: BFS invariant — every level-h node has a level-(h-1) in-neighbor") {
    val dist = q("q115_bfs_hops")
    val li = Tables(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    val a = li.select(col("l_orderkey").as("k"), col("l_partkey").as("p1"))
    val b = li.select(col("l_orderkey").as("k"), col("l_partkey").as("p2"))
    val und = a.join(b, "k").where(col("p1") < col("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).as("n")).where(col("n") >= 2)
    val edges = und.select(col("p1").as("src"), col("p2").as("dst"))
      .union(und.select(col("p2"), col("p1")))
    val root = dist.where(col("hops") === 0).collect()
    assert(root.map(_.getLong(0)).toSeq == Seq(1L))
    // every non-root (node, h) needs an edge from some node at h-1
    val orphans = dist.where(col("hops") > 0).as("d")
      .join(edges.as("e"), col("e.dst") === col("d.part"), "left")
      .join(dist.select(col("part").as("sp"), col("hops").as("sh")).as("s"),
        col("e.src") === col("s.sp") && col("s.sh") === col("d.hops") - 1, "left")
      .groupBy("d.part").agg(sum(when(col("s.sp").isNotNull, 1).otherwise(0)).as("ok"))
      .where(col("ok") === 0)
    assert(orphans.isEmpty, "found BFS level without a predecessor")
  }

  test("q116: clustering coefficient matches its own degree/triangle columns") {
    val rows = q("q116_triangle_count").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val (deg, tri, cc) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      val expect = if (deg >= 2)
        BigDecimal(2.0 * tri / (deg * (deg - 1.0)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      else 0.0
      assert(math.abs(cc - expect) < 1e-9, s"node ${r.getLong(0)}")
    }
  }

  test("q121: status counts equal direct modular arithmetic on the key space") {
    val got = q("q121_snapshot_diff").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keys = Tables(spark, sf, "orders").select(col("o_orderkey").as("k"))
    def n(p: org.apache.spark.sql.Column): Long = keys.where(p).count()
    val removed = n(col("k") % 7 === 0)
    val added = n(col("k") % 11 === 0)
    val changed = n(col("k") % 7 =!= 0 && col("k") % 5 === 0)
    val unchanged = n(col("k") % 7 =!= 0 && col("k") % 5 =!= 0)
    assert(got === Map("removed" -> removed, "added" -> added,
      "changed" -> changed, "unchanged" -> unchanged))
  }

  test("q123: count-min estimates never undercount") {
    val rows = q("q123_count_min_sketch").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (exact, est, over) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est >= exact, s"CMS undercounted part ${r.getLong(0)}")
      assert(over == est - exact)
    }
  }

  test("q124: clusters are internally consistent (sorted members, canonical min, shared noun)") {
    val rows = q("q124_entity_resolution").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (entity, n, members) = (r.getString(0), r.getLong(1), r.getString(2).split(";").toSeq)
      assert(members.size == n && n >= 2)
      assert(members == members.sorted, "members not sorted")
      assert(entity == members.head, "canonical is not the min member")
      val nouns = members.map(_.split(" ").last).distinct
      assert(nouns.size == 1, s"cluster $entity mixes nouns $nouns")
    }
  }

  test("q117: n_months equals the independent per-nation distinct month count") {
    val got = q("q117_trend_ols").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "customer"), col("o_custkey") === col("c_custkey"))
      .join(Tables(spark, sf, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(countDistinct(year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expect)
  }

  test("q122: association scores satisfy their defining ratios") {
    val rows = q("q122_market_basket").collect()
    assert(rows.nonEmpty)
    val items = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p")).distinct()
    val nb = items.select("k").distinct().count()
    val np = items.groupBy("p").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (p1, p2, nab) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(p1 < p2 && nab >= 3)
      val conf = BigDecimal(nab.toDouble / np(p1))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val lift = BigDecimal(nab.toDouble * nb / (np(p1).toDouble * np(p2)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - conf) < 1e-9)
      assert(math.abs(r.getDouble(4) - lift) < 1e-9)
    }
  }
}
