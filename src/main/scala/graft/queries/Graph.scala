package graft.queries

import graft.{GraftQuery, QueryPack, Tables}
import graft.operators.{ConnectedComponents, ShortestPaths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 surface: graph analytics over relationship structure *derived*
  * from relational data — the co-purchase graph (parts appearing in the
  * same order at least twice) and the name-variant graph (edit-distance
  * pairs within a blocking key). Adds the traversal/counting primitives a
  * warehouse needs beyond PageRank (q103) and the dedup-cluster use of
  * connected components (q69/q99): BFS reachability, triangle counting
  * with clustering coefficients, and entity resolution (fuzzy pairs →
  * components → canonical ids).
  *
  * Oracle note: q115 and q124 are checked against DuckDB `WITH RECURSIVE`
  * CTEs — the first genuinely *recursive* oracles in the suite, so the
  * iterative operators (ShortestPaths, ConnectedComponents) are
  * hash-verified against an independent fixpoint formulation rather than
  * rows-only pinned.
  *
  * Scale notes:
  *   - co-purchase edges are per-order pair fanout: sum over orders of
  *     C(basket, 2) — linear in orders for bounded baskets (max 13 here);
  *     the `count >= 2` support floor then drops ~97% of pairs, so the
  *     graph ops run on the pruned edge set, never the raw pair stream.
  *   - q115: each BFS iteration shuffles O(|reached|) rows, lineage cut
  *     per iteration; hop cap 12 bounds the loop like the oracle's depth
  *     cap.
  *   - q116: the triangle join is edge-edge-edge on (p1 < p2 < p3)-ordered
  *     edges, so each triangle is counted exactly once and the join never
  *     explores both orientations; on skewed degree distributions the
  *     standard refinement is degree-ordering the vertices first.
  *   - q124: blocking (head noun) caps the candidate pairs, components run
  *     on dense integer ids from the distributed prefix scan (range
  *     shuffle, never a one-task global window over the vocabulary).
  */
object Graph extends QueryPack {

  /** Undirected co-purchase edges (p1 < p2) with support >= 2: parts that
    * appear together in the same order at least twice.
    */
  private def coPurchase(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem").select("l_orderkey", "l_partkey")
    // pairs-within-group via ONE shuffle: the textbook self-join on
    // l_orderkey exchanges the fact table TWICE (both join inputs hash on
    // the key) before the pair aggregation's third exchange. Grouping to a
    // per-order part list and expanding index pairs (j > i, distinct
    // values, emitted as (least, greatest) — exactly the multiset the
    // p1 < p2 self-join produces, order-insensitive so collect_list's
    // nondeterminism is immaterial) costs one exchange of the fact table +
    // the pair aggregation. Per-order line counts are bounded (≤7 in TPC-H;
    // any d² blowup hits the self-join identically), so the expansion is
    // skew-safe.
    graft.operators.BasketPairs.explodePairsMulti(
      li.groupBy(col("l_orderkey"))
        .agg(collect_list(col("l_partkey")).as("ps")), "ps")
      .groupBy("p1", "p2").agg(count(lit(1)).as("n"))
      .where(col("n") >= 2)
  }

  private val coPurchaseSql = """
    SELECT a.l_partkey AS p1, b.l_partkey AS p2
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2 HAVING count(*) >= 2"""

  def queries: Seq[GraftQuery] = Seq(

    // BFS hop distances from part 1 over the undirected co-purchase graph,
    // depth-capped at 12 — reachability with exact shortest hop counts,
    // oracle'd by a depth-capped recursive CTE computing min-over-walks.
    GraftQuery(
      "q115_bfs_hops",
      (s, dir) => {
        val pr = coPurchase(s, dir)
        val edges = pr.select(col("p1").as("src"), col("p2").as("dst"))
          .union(pr.select(col("p2").as("src"), col("p1").as("dst")))
        ShortestPaths.hops(edges, source = 1L, maxHops = 12)
          .select(col("node").cast("long").as("part"), col("hops"))
          .orderBy("hops", "part")
      },
      Some(s"""WITH RECURSIVE p AS ($coPurchaseSql),
        |e AS (SELECT p1 AS src, p2 AS dst FROM p UNION ALL SELECT p2, p1 FROM p),
        |walk(node, d) AS (
        |  SELECT CAST(1 AS BIGINT), 0
        |  UNION
        |  SELECT e.dst, walk.d + 1 FROM walk JOIN e ON e.src = walk.node
        |  WHERE walk.d < 12)
        |SELECT CAST(node AS BIGINT) AS part, CAST(min(d) AS BIGINT) AS hops
        |FROM walk GROUP BY node ORDER BY hops, part""".stripMargin)),

    // Triangle counting + local clustering coefficient on the co-purchase
    // graph: per-part triangle membership and 2T/(d(d-1)), top-20.
    GraftQuery(
      "q116_triangle_count",
      (s, dir) => {
        val p = coPurchase(s, dir).select("p1", "p2").localCheckpoint()
        val deg = p.select(col("p1").as("node")).union(p.select(col("p2")))
          .groupBy("node").agg(count(lit(1)).as("degree"))
        val tri = p.as("e1")
          .join(p.as("e2"), col("e1.p2") === col("e2.p1"))
          .join(p.as("e3"),
            col("e3.p1") === col("e1.p1") && col("e3.p2") === col("e2.p2"))
          .select(col("e1.p1").as("a"), col("e1.p2").as("b"), col("e2.p2").as("c"))
        val perNode = tri.select(col("a").as("node"))
          .union(tri.select(col("b"))).union(tri.select(col("c")))
          .groupBy("node").agg(count(lit(1)).as("tri"))
        deg.join(perNode, Seq("node"), "left")
          .select(col("node").as("part"), col("degree"),
            coalesce(col("tri"), lit(0L)).as("triangles"),
            round(when(col("degree") >= 2,
                lit(2.0) * coalesce(col("tri"), lit(0L))
                  / (col("degree") * (col("degree") - 1)))
              .otherwise(lit(0.0)), 6).as("clustering"))
          .orderBy(col("triangles").desc, col("part"))
          .limit(20)
      },
      Some(s"""WITH p AS ($coPurchaseSql),
        |deg AS (
        |  SELECT node, count(*) AS deg FROM (
        |    SELECT p1 AS node FROM p UNION ALL SELECT p2 FROM p) GROUP BY 1),
        |tri AS (
        |  SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
        |  FROM p e1 JOIN p e2 ON e1.p2 = e2.p1
        |  JOIN p e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2),
        |pertri AS (
        |  SELECT node, count(*) AS tri FROM (
        |    SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        |    UNION ALL SELECT c FROM tri) GROUP BY 1)
        |SELECT d.node AS part, CAST(d.deg AS BIGINT) AS degree,
        |  CAST(COALESCE(t.tri, 0) AS BIGINT) AS triangles,
        |  round(CASE WHEN d.deg >= 2
        |    THEN 2.0 * COALESCE(t.tri, 0) / (d.deg * (d.deg - 1))
        |    ELSE 0 END, 6) AS clustering
        |FROM deg d LEFT JOIN pertri t ON d.node = t.node
        |ORDER BY triangles DESC, part LIMIT 20""".stripMargin)),

    // Entity resolution: noun-blocked edit-distance pairs over the
    // distinct part-name vocabulary (q109's blocking), connected
    // components over the variant graph, canonical entity = lexicographic
    // min member — oracle'd by a recursive-CTE transitive closure, so the
    // ConnectedComponents operator itself is hash-verified here.
    GraftQuery(
      "q124_entity_resolution",
      (s, dir) => {
        val base = Tables(s, dir, "part")
          .select(lower(col("p_name")).as("name")).distinct()
          .withColumn("noun", element_at(split(col("name"), " "), -1))
        // dense ids for the component loop (numeric labels converge via
        // the decimal sum probe) — ranked by the distributed scan, not a
        // global window: the name vocabulary is unbounded at 100 TB and a
        // partition-less row_number would sort it in ONE task
        val names = graft.operators.DistributedPrefixSum.scan(
            base, Seq("name"), Nil, idxName = "id")
          .localCheckpoint()
        val a = names.select(col("noun"), col("name").as("n1"), col("id").as("id1"))
        val b = names.select(col("noun"), col("name").as("n2"), col("id").as("id2"))
        val pairs = a.join(b, "noun")
          // q109's band prune: |len diff| <= 3 is implied by dist <= 3 and
          // costs O(1) per pair vs levenshtein's O(len²)
          .where(col("n1") < col("n2") &&
            abs(length(col("n1")) - length(col("n2"))) <= 3 &&
            levenshtein(col("n1"), col("n2")) <= 3)
          .select("id1", "id2")
        val comp = ConnectedComponents.run(pairs, maxIter = 15)
        comp.join(names, comp("node") === names("id"))
          .groupBy(col("component"))
          .agg(min(col("name")).as("entity"),
            count(lit(1)).as("n_variants"),
            array_join(array_sort(collect_list(col("name"))), ";").as("members"))
          .where(col("n_variants") >= 2)
          .select("entity", "n_variants", "members")
          .orderBy("entity")
      },
      Some("""WITH RECURSIVE names AS (
        |  SELECT DISTINCT lower(p_name) AS name FROM part),
        |t AS (SELECT name, string_split(name, ' ')[-1] AS noun FROM names),
        |pr AS (
        |  SELECT a.name AS n1, b.name AS n2 FROM t a JOIN t b ON a.noun = b.noun
        |  WHERE a.name < b.name
        |    AND abs(length(a.name) - length(b.name)) <= 3
        |    AND levenshtein(a.name, b.name) <= 3),
        |e AS (SELECT n1 AS a, n2 AS b FROM pr UNION SELECT n2, n1 FROM pr),
        |nodes AS (SELECT DISTINCT a AS node FROM e),
        |reach(node, r) AS (
        |  SELECT node, node FROM nodes
        |  UNION
        |  SELECT reach.node, e.b FROM reach JOIN e ON e.a = reach.r),
        |comp AS (SELECT node, min(r) AS entity FROM reach GROUP BY node)
        |SELECT entity, CAST(count(*) AS BIGINT) AS n_variants,
        |  string_agg(node, ';' ORDER BY node) AS members
        |FROM comp GROUP BY entity HAVING count(*) >= 2
        |ORDER BY entity""".stripMargin)),

    // k-core decomposition of the co-purchase graph — coreness histogram
    // via [[graft.operators.KCore]] iterative peeling (groupBy-degree +
    // anti-join rounds, lineage cut per round). Coreness is the
    // graph-strength signal a recommender or community pass filters on:
    // high-core parts sit in dense co-purchase clusters, coreness-1 parts
    // are incidental pairings. Iterative fixpoint → no single SQL oracle;
    // peel semantics are pinned exactly in KCoreSpec (clique/triangle/
    // path/ring fixtures), and the driver records the rows-only check.
    GraftQuery(
      "q232_kcore_copurchase",
      (s, dir) => {
        val pr = coPurchase(s, dir)
        graft.operators.KCore
          .decompose(pr.select(col("p1"), col("p2")))
          .groupBy(col("coreness"))
          .agg(count(lit(1)).as("n_nodes"),
            min(col("node")).as("min_part"), max(col("node")).as("max_part"))
          .orderBy("coreness")
      },
      // Oracle-checked since r14: the peel loop UNROLLS — each block is one
      // wave (deg ≤ running-max-of-min-degree removed at that coreness,
      // edges shrink), and once the graph empties the remaining blocks are
      // exact no-ops, so a generous fixed unroll computes the same
      // fixpoint the engine's loop (and its spec-pinned driver tail)
      // reaches. 60 blocks ≥ the oracle graph's waves by a wide margin
      // (17 at sf0.01); the engine itself guards pathological chains with
      // maxIter = 200, loud.
      Some(kcoreReplaySql(60))),

    // Nation trade balance — the weighted in/out degree rollup of the
    // q103/q227 trade graph: per nation, export revenue (its suppliers'
    // lines), import revenue (its customers' orders' lines), and the net
    // balance. One lineitem scan feeds both directions (supplier side
    // directly, customer side through the orders key); exact cents; the
    // nation dim broadcasts twice.
    GraftQuery(
      "q263_trade_balance",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"),
            expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)")
              .as("c"))
        val sup = broadcast(Tables(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey")))
        val cust = Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
          .join(broadcast(Tables(s, dir, "customer")
            .select(col("c_custkey"), col("c_nationkey"))),
            col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("c_nationkey"))
        val exports = li.join(sup, col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_nationkey").as("nk")).agg(sum(col("c")).as("exp_c"))
        val imports = li.join(cust, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("c_nationkey").as("nk")).agg(sum(col("c")).as("imp_c"))
        exports.join(imports, Seq("nk"), "full")
          .join(broadcast(Tables(s, dir, "nation")), col("nk") === col("n_nationkey"))
          .select(col("n_name"),
            (coalesce(col("exp_c"), lit(0L)).cast("double") / 100.0).as("exports"),
            (coalesce(col("imp_c"), lit(0L)).cast("double") / 100.0).as("imports"),
            ((coalesce(col("exp_c"), lit(0L)) - coalesce(col("imp_c"), lit(0L)))
              .cast("double") / 100.0).as("net_balance"))
          .orderBy("n_name")
      },
      Some("""WITH li AS (
        |  SELECT l_orderkey, l_suppkey,
        |    CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS c
        |  FROM lineitem),
        |exp_ AS (
        |  SELECT s_nationkey AS nk, CAST(SUM(c) AS BIGINT) AS exp_c
        |  FROM li JOIN supplier ON l_suppkey = s_suppkey GROUP BY 1),
        |imp_ AS (
        |  SELECT c_nationkey AS nk, CAST(SUM(c) AS BIGINT) AS imp_c
        |  FROM li JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey GROUP BY 1)
        |SELECT n_name,
        |  CAST(COALESCE(exp_c, 0) AS DOUBLE) / 100.0 AS exports,
        |  CAST(COALESCE(imp_c, 0) AS DOUBLE) / 100.0 AS imports,
        |  CAST(COALESCE(exp_c, 0) - COALESCE(imp_c, 0) AS DOUBLE) / 100.0
        |    AS net_balance
        |FROM exp_ FULL JOIN imp_ USING (nk)
        |JOIN nation ON nk = n_nationkey
        |ORDER BY n_name""".stripMargin)))
  /** DuckDB replay of [[graft.operators.KCore.decompose]] over the
    * co-purchase graph: `n` unrolled peel waves as MATERIALIZED CTE blocks
    * (see the q232 comment for why a bounded unroll is exact).
    */
  private def kcoreReplaySql(n: Int): String = {
    val head = s"""pairs AS MATERIALIZED (
      |  SELECT a.l_partkey AS p1, b.l_partkey AS p2
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |e0 AS MATERIALIZED (
      |  SELECT p1 AS src, p2 AS dst FROM pairs
      |  UNION SELECT p2, p1 FROM pairs),
      |act0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM e0),
      |k0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS kk)""".stripMargin
    val blocks = (1 to n).map { i =>
      val p = i - 1
      s"""d$i AS MATERIALIZED (
        |  SELECT a.node, COALESCE(c.c, 0) AS deg
        |  FROM act$p a LEFT JOIN (SELECT src, COUNT(*) AS c FROM e$p GROUP BY src) c
        |    ON c.src = a.node),
        |k$i AS MATERIALIZED (
        |  SELECT CASE WHEN (SELECT COUNT(*) FROM d$i) = 0 THEN (SELECT kk FROM k$p)
        |    ELSE greatest((SELECT kk FROM k$p), (SELECT MIN(deg) FROM d$i)) END AS kk),
        |rm$i AS MATERIALIZED (
        |  SELECT node, (SELECT kk FROM k$i) AS coreness
        |  FROM d$i WHERE deg <= (SELECT kk FROM k$i)),
        |act$i AS MATERIALIZED (
        |  SELECT node FROM d$i WHERE deg > (SELECT kk FROM k$i)),
        |e$i AS MATERIALIZED (
        |  SELECT e.src, e.dst FROM e$p e
        |  WHERE e.src NOT IN (SELECT node FROM rm$i)
        |    AND e.dst NOT IN (SELECT node FROM rm$i))""".stripMargin
    }
    val union = (1 to n).map(i => s"SELECT * FROM rm$i").mkString(" UNION ALL ")
    ((head +: blocks).mkString("WITH ", ",\n", "")) + s"""
      |SELECT CAST(coreness AS BIGINT) AS coreness,
      |  CAST(COUNT(*) AS BIGINT) AS n_nodes,
      |  CAST(MIN(node) AS BIGINT) AS min_part,
      |  CAST(MAX(node) AS BIGINT) AS max_part
      |FROM ($union) GROUP BY coreness ORDER BY coreness""".stripMargin
  }

}
