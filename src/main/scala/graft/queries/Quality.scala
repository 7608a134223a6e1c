package graft.queries

import graft.{GraftQuery, QueryPack, Tables}
import org.apache.spark.sql.functions._

/** Round-7 surface: the data-quality / pipeline-hygiene operators a
  * warehouse load runs before anything downstream trusts the tables — a
  * constraint audit (nulls, key uniqueness, referential integrity, domain
  * and cross-column rules), a snapshot differ (added/removed/changed
  * classification between two table versions), and an oracle-checked
  * count-min sketch (the frequency-estimation sketch, expressed as the
  * same dataflow both engines can evaluate exactly).
  *
  * Scale notes:
  *   - q120: per-table rule groups share ONE scan each (conditional sums +
  *     count-distinct in a single aggregate); referential checks are
  *     anti-joins on the key — the big-table side never shuffles more than
  *     once per check group.
  *   - q121: the diff is one full outer join on the snapshot key; the
  *     report aggregates to O(statuses) rows. All-integer output — no
  *     float in the hash path.
  *   - q123: sketch construction is a (depth x width)-bounded aggregation
  *     (here 4x256 = 1024 cells) — the merge of per-partition partial
  *     sketches is exactly Spark's partial+final aggregate; the estimate
  *     join broadcasts the 1024-cell sketch. The md5-derived bucket
  *     function is the portable subset both engines hash identically
  *     (hexDigitVal), making the sketch itself oracle-verifiable: est >=
  *     exact for every key by construction.
  */
object Quality extends QueryPack {

  def queries: Seq[GraftQuery] = Seq(

    // Constraint audit across orders / lineitem / customer / documents:
    // null rates, key uniqueness, referential orphans, domain rules, and
    // a cross-table rule (shipments dated before their order).
    GraftQuery(
      "q120_dq_audit",
      (s, dir) => {
        val orders = Tables(s, dir, "orders")
        val lineitem = Tables(s, dir, "lineitem")
        val customer = Tables(s, dir, "customer")
        val documents = Tables(s, dir, "documents")

        def audit(name: String, bad: org.apache.spark.sql.Column,
            from: org.apache.spark.sql.DataFrame) =
          from.agg(sum(when(bad, 1L).otherwise(0L)).as("n_bad"),
              count(lit(1)).as("n_total"))
            .select(lit(name).as("check_name"), col("n_bad"), col("n_total"))

        // one scan for both orders row-rules + key uniqueness
        val ordersChecks = orders.agg(
            sum(when(col("o_orderpriority").isNull, 1L).otherwise(0L)).as("nullprio"),
            sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("badprice"),
            (count(lit(1)) - countDistinct(col("o_orderkey"))).as("dupkey"),
            count(lit(1)).as("n"))
          .select(explode(array(
            struct(lit("orders_dup_orderkey").as("check_name"),
              col("dupkey").as("n_bad"), col("n").as("n_total")),
            struct(lit("orders_null_priority").as("check_name"),
              col("nullprio").as("n_bad"), col("n").as("n_total")),
            struct(lit("orders_nonpositive_price").as("check_name"),
              col("badprice").as("n_bad"), col("n").as("n_total")))).as("r"))
          .select(col("r.check_name"), col("r.n_bad"), col("r.n_total"))

        val liChecks = lineitem.agg(
            sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L)
              .otherwise(0L)).as("baddisc"),
            sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)).as("badqty"),
            count(lit(1)).as("n"))
          .select(explode(array(
            struct(lit("lineitem_discount_range").as("check_name"),
              col("baddisc").as("n_bad"), col("n").as("n_total")),
            struct(lit("lineitem_nonpositive_qty").as("check_name"),
              col("badqty").as("n_bad"), col("n").as("n_total")))).as("r"))
          .select(col("r.check_name"), col("r.n_bad"), col("r.n_total"))

        // anti-join yields only the bad rows; the table total joins in as a
        // broadcast 1-row frame so the builder itself stays lazy
        def orphan(name: String, bad: org.apache.spark.sql.DataFrame,
            total: org.apache.spark.sql.DataFrame) =
          bad.agg(count(lit(1)).as("n_bad"))
            .crossJoin(broadcast(total.agg(count(lit(1)).as("n_total"))))
            .select(lit(name).as("check_name"), col("n_bad"), col("n_total"))
        val orphanLi = orphan("lineitem_orphan_order",
          lineitem.select("l_orderkey")
            .join(orders.select("o_orderkey"),
              col("l_orderkey") === col("o_orderkey"), "left_anti"),
          lineitem)
        val orphanOrd = orphan("orders_orphan_customer",
          orders.select("o_custkey")
            .join(customer.select("c_custkey"),
              col("o_custkey") === col("c_custkey"), "left_anti"),
          orders)
        val shipBefore = audit("lineitem_ship_before_order",
          col("l_shipdate") < col("o_orderdate"),
          lineitem.select("l_orderkey", "l_shipdate")
            .join(orders.select("o_orderkey", "o_orderdate"),
              col("l_orderkey") === col("o_orderkey")))
        val docEmpty = audit("documents_empty_text",
          col("text").isNull || length(trim(col("text"))) === 0, documents)

        ordersChecks.unionByName(liChecks).unionByName(orphanLi)
          .unionByName(orphanOrd).unionByName(shipBefore).unionByName(docEmpty)
          .select(col("check_name"), col("n_bad"), col("n_total"),
            round(col("n_bad") / col("n_total"), 6).as("bad_frac"))
          .orderBy("check_name")
      },
      Some("""WITH checks AS (
        |  SELECT 'orders_dup_orderkey' AS check_name,
        |    count(*) - count(DISTINCT o_orderkey) AS n_bad, count(*) AS n_total
        |  FROM orders
        |  UNION ALL
        |  SELECT 'orders_null_priority',
        |    SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END), count(*)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'orders_nonpositive_price',
        |    SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END), count(*)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'lineitem_discount_range',
        |    SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END), count(*)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem_nonpositive_qty',
        |    SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END), count(*)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem_orphan_order',
        |    (SELECT count(*) FROM lineitem l
        |     WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
        |    count(*)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'orders_orphan_customer',
        |    (SELECT count(*) FROM orders o
        |     WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
        |    count(*)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'lineitem_ship_before_order',
        |    SUM(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END), count(*)
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  UNION ALL
        |  SELECT 'documents_empty_text',
        |    SUM(CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 1 ELSE 0 END),
        |    count(*)
        |  FROM documents)
        |SELECT check_name, CAST(n_bad AS BIGINT) AS n_bad,
        |  CAST(n_total AS BIGINT) AS n_total,
        |  round(CAST(n_bad AS DOUBLE) / n_total, 6) AS bad_frac
        |FROM checks ORDER BY check_name""".stripMargin)),

    // Snapshot diff: classify every key across two simulated versions of
    // the orders table (deletes = key % 7 == 0 gone, updates = key % 5 ==
    // 0 repriced, inserts = offset new keys) via one full outer join.
    // All-integer report: status counts + key ranges.
    GraftQuery(
      "q121_snapshot_diff",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
          .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
        val snapA = o
        val survivors = o.where(col("k") % 7 =!= 0)
          .select(col("k"),
            when(col("k") % 5 === 0, col("price") + lit(10.0))
              .otherwise(col("price")).as("price"))
        val inserts = o.where(col("k") % 11 === 0)
          .select((col("k") + lit(1000000000L)).as("k"), col("price"))
        val snapB = survivors.unionByName(inserts)
        snapA.as("a").join(snapB.as("b"), col("a.k") === col("b.k"), "full_outer")
          .select(
            when(col("b.k").isNull, "removed")
              .when(col("a.k").isNull, "added")
              .when(col("a.price") =!= col("b.price"), "changed")
              .otherwise("unchanged").as("status"),
            coalesce(col("a.k"), col("b.k")).as("k"))
          .groupBy("status")
          .agg(count(lit(1)).as("n"), min(col("k")).as("min_key"),
            max(col("k")).as("max_key"))
          .orderBy("status")
      },
      Some("""WITH a AS (
        |  SELECT o_orderkey AS k, o_totalprice AS price FROM orders),
        |b AS (
        |  SELECT k, CASE WHEN k % 5 = 0 THEN price + 10.0 ELSE price END AS price
        |  FROM a WHERE k % 7 <> 0
        |  UNION ALL
        |  SELECT k + 1000000000, price FROM a WHERE k % 11 = 0),
        |d AS (
        |  SELECT CASE WHEN b.k IS NULL THEN 'removed'
        |              WHEN a.k IS NULL THEN 'added'
        |              WHEN a.price <> b.price THEN 'changed'
        |              ELSE 'unchanged' END AS status,
        |    COALESCE(a.k, b.k) AS k
        |  FROM a FULL OUTER JOIN b ON a.k = b.k)
        |SELECT status, CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(k) AS BIGINT) AS min_key, CAST(max(k) AS BIGINT) AS max_key
        |FROM d GROUP BY status ORDER BY status""".stripMargin)),

    // Count-min sketch over part frequencies (depth 4 x width 256,
    // md5-derived row hashes): per-key estimate = min over rows of the
    // key's bucket sum; est >= exact always. Reported for the top-10
    // exact keys so the overcount is visible and hash-checkable.
    GraftQuery(
      "q123_count_min_sketch",
      (s, dir) => {
        val kc = Tables(s, dir, "lineitem")
          .groupBy(col("l_partkey").as("key"))
          .agg(count(lit(1)).as("n"))
        def hx(c: org.apache.spark.sql.Column) = hexDigitVal(c)
        val keyed = kc
          .select(col("key"), col("n"),
            explode(array((0 to 3).map(i => lit(i)): _*)).as("i"))
          .withColumn("h",
            md5(concat(col("i").cast("string"), lit("_"), col("key").cast("string"))))
          .withColumn("bucket",
            hx(substring(col("h"), 1, 1)) * 16 + hx(substring(col("h"), 2, 1)))
          .select("key", "n", "i", "bucket")
        val cms = keyed.groupBy("i", "bucket").agg(sum(col("n")).as("bsum"))
        val est = keyed.join(broadcast(cms), Seq("i", "bucket"))
          .groupBy("key").agg(min(col("bsum")).as("est"))
        kc.join(est, "key")
          .select(col("key").as("part"), col("n").as("exact_n"),
            col("est").as("est_n"), (col("est") - col("n")).as("overcount"))
          .orderBy(col("exact_n").desc, col("part"))
          .limit(10)
      },
      Some("""WITH kc AS (
        |  SELECT l_partkey AS key, count(*) AS n FROM lineitem GROUP BY 1),
        |rows_ AS (
        |  SELECT key, n, i,
        |    (instr('0123456789abcdef', substr(md5(CAST(i AS VARCHAR) || '_' || CAST(key AS VARCHAR)), 1, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(CAST(i AS VARCHAR) || '_' || CAST(key AS VARCHAR)), 2, 1)) - 1) AS bucket
        |  FROM kc CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i)),
        |cms AS (SELECT i, bucket, SUM(n) AS bsum FROM rows_ GROUP BY 1, 2),
        |est AS (
        |  SELECT r.key, min(c.bsum) AS est
        |  FROM rows_ r JOIN cms c ON r.i = c.i AND r.bucket = c.bucket
        |  GROUP BY r.key)
        |SELECT k.key AS part, CAST(k.n AS BIGINT) AS exact_n,
        |  CAST(e.est AS BIGINT) AS est_n, CAST(e.est - k.n AS BIGINT) AS overcount
        |FROM kc k JOIN est e ON k.key = e.key
        |ORDER BY exact_n DESC, part LIMIT 10""".stripMargin)),

    // Referential-integrity audit across the whole star — orphaned
    // foreign keys per edge (lineitem→orders, lineitem→part,
    // orders→customer, customer→nation), each edge one left-anti
    // aggregate against the distinct parent key set. The cross-table DQ
    // sweep every warehouse load gate runs; broadcast where the parent
    // side is small, shuffle where it is not — Spark picks per edge.
    GraftQuery(
      "q163_referential_integrity",
      (s, dir) => {
        def edge(name: String, child: org.apache.spark.sql.DataFrame, fk: String,
            parent: org.apache.spark.sql.DataFrame, pk: String) = {
          val orphans = child.select(col(fk)).join(
            parent.select(col(pk)).distinct(), col(fk) === col(pk), "left_anti")
          child.select(count(lit(1)).as("n_child")).crossJoin(
            orphans.select(count(lit(1)).as("n_orphans")))
            .select(lit(name).as("edge"), col("n_child"), col("n_orphans"))
        }
        val li = Tables(s, dir, "lineitem")
        val o = Tables(s, dir, "orders")
        val c = Tables(s, dir, "customer")
        val n = Tables(s, dir, "nation")
        val p = Tables(s, dir, "part")
        edge("customer->nation", c, "c_nationkey", n, "n_nationkey")
          .unionAll(edge("lineitem->orders", li, "l_orderkey", o, "o_orderkey"))
          .unionAll(edge("lineitem->part", li, "l_partkey", p, "p_partkey"))
          .unionAll(edge("orders->customer", o, "o_custkey", c, "c_custkey"))
          .orderBy("edge")
      },
      Some {
        def edge(name: String, child: String, fk: String, parent: String, pk: String) =
          s"""SELECT '$name' AS edge,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM $child) AS n_child,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM $child
              WHERE $fk NOT IN (SELECT DISTINCT $pk FROM $parent)) AS n_orphans"""
        Seq(
          edge("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
          edge("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
          edge("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
          edge("orders->customer", "orders", "o_custkey", "customer", "c_custkey"))
          .mkString(" UNION ALL ") + " ORDER BY edge"
      }),

    // First-order Markov transition matrix over per-user event sequences —
    // P(next event type | current) with exact transition counts (lead
    // window, one shuffle) and the probability as the only float, round 6.
    // The sequence model behind session simulation and anomaly scoring.
    GraftQuery(
      "q164_markov_transitions",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        val tr = Tables(s, dir, "events")
          .select(col("user_id"), expr("ts div 1000").as("us"),
            col("event_id"), col("event_type"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("cur"), col("next_type").as("nxt"))
          .agg(count(lit(1)).as("n"))
        val w2 = Window.partitionBy("cur")
        tr.withColumn("row_total", sum(col("n")).over(w2))
          .select(col("cur"), col("nxt"), col("n"),
            round(col("n").cast("double") / col("row_total").cast("double"), 6).as("p"))
          .orderBy("cur", "nxt")
      },
      Some("""WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events),
        |t AS (
        |  SELECT event_type AS cur,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS nxt
        |  FROM e),
        |c AS (
        |  SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM t WHERE nxt IS NOT NULL GROUP BY cur, nxt)
        |SELECT cur, nxt, n,
        |  round(CAST(n AS DOUBLE)
        |        / CAST(SUM(n) OVER (PARTITION BY cur) AS DOUBLE), 6) AS p
        |FROM c ORDER BY cur, nxt""".stripMargin)),

    // A/B exposure analysis — the experimentation read-out: users assigned
    // to arms by a salted content hash (q73's md5-bucket idiom — stable
    // under re-runs, balanced, no RNG), outcome = purchase conversion per
    // arm with exact counts; rate and lift are the only floats. The same
    // query shape at 100 TB: one distinct + two aggregations.
    GraftQuery(
      "q169_ab_exposure",
      (s, dir) => {
        val hexpos = graft.queries.hexDigitVal _
        val h = md5(concat(lit("exp1:"), col("user_id").cast("string")))
        val users = Tables(s, dir, "events")
          .select(col("user_id"), col("event_type"))
          .withColumn("arm",
            when(hexpos(substring(h, 1, 1)) < 8, "control").otherwise("treatment"))
        val exposure = users.select(col("user_id"), col("arm")).distinct()
        val converted = users.filter(col("event_type") === "purchase")
          .select(col("user_id")).distinct()
        exposure.join(converted.withColumn("c", lit(1L)), Seq("user_id"), "left")
          .groupBy(col("arm"))
          .agg(count(lit(1)).as("n_users"),
            sum(coalesce(col("c"), lit(0L))).as("n_converted"))
          .withColumn("rate",
            round(col("n_converted").cast("double") / col("n_users").cast("double"), 6))
          .orderBy("arm")
      },
      Some("""WITH u AS (
        |  SELECT DISTINCT user_id,
        |    CASE WHEN (instr('0123456789abcdef',
        |           substr(md5('exp1:' || CAST(user_id AS VARCHAR)), 1, 1)) - 1) < 8
        |         THEN 'control' ELSE 'treatment' END AS arm
        |  FROM events),
        |c AS (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        |SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_converted,
        |  round(CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |        / COUNT(*), 6) AS rate
        |FROM u LEFT JOIN c USING (user_id)
        |GROUP BY arm ORDER BY arm""".stripMargin)),

    // Erasure cascade audit — the right-to-be-forgotten dry run: given a
    // deterministic tombstone list (every 37th customer), count the rows
    // each table would lose (customer → orders → lineitem via the order
    // keys) and what survives. Pure anti-join arithmetic; the multi-table
    // cascade accounting every privacy pipeline runs before the real
    // delete.
    GraftQuery(
      "q190_erasure_cascade",
      (s, dir) => {
        val tomb = Tables(s, dir, "customer")
          .filter(col("c_custkey") % 37 === 0).select(col("c_custkey"))
        val o = Tables(s, dir, "orders")
        val li = Tables(s, dir, "lineitem")
        val doomedOrders = o.join(broadcast(tomb),
          col("o_custkey") === col("c_custkey")).select(col("o_orderkey"))
        def row(tbl: String, total: org.apache.spark.sql.DataFrame,
            doomed: org.apache.spark.sql.DataFrame) =
          total.agg(count(lit(1)).as("n_rows")).crossJoin(
            doomed.agg(count(lit(1)).as("n_erased")))
            .select(lit(tbl).as("tbl"), col("n_rows"), col("n_erased"),
              (col("n_rows") - col("n_erased")).as("n_surviving"))
        row("customer", Tables(s, dir, "customer"),
            Tables(s, dir, "customer").join(broadcast(tomb), Seq("c_custkey")))
          .unionAll(row("lineitem", li,
            li.join(doomedOrders, col("l_orderkey") === col("o_orderkey"))))
          .unionAll(row("orders", o, doomedOrders))
          .orderBy("tbl")
      },
      Some("""WITH tomb AS (
        |  SELECT c_custkey FROM customer WHERE c_custkey % 37 = 0),
        |doomed_o AS (
        |  SELECT o_orderkey FROM orders
        |  WHERE o_custkey IN (SELECT c_custkey FROM tomb))
        |SELECT 'customer' AS tbl,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_rows,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM tomb) AS n_erased,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer)
        |    - (SELECT CAST(COUNT(*) AS BIGINT) FROM tomb) AS n_surviving
        |UNION ALL SELECT 'lineitem',
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
        |   WHERE l_orderkey IN (SELECT o_orderkey FROM doomed_o)),
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem)
        |    - (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
        |       WHERE l_orderkey IN (SELECT o_orderkey FROM doomed_o))
        |UNION ALL SELECT 'orders',
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM doomed_o),
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders)
        |    - (SELECT CAST(COUNT(*) AS BIGINT) FROM doomed_o)
        |ORDER BY tbl""".stripMargin)),

    // Exact Gini coefficient on customer revenue — inequality as the
    // closed-form over the sorted cumulative: G = 2·Σ(i·xᵢ)/(n·Σx) −
    // (n+1)/n. Σ(i·xᵢ) runs as rank·cents Long products split hi/lo
    // (overflow-free to ~10⁹ customers); the two divisions at the end are
    // the only floats. Pairs with q176's Pareto cutoffs. The rank is
    // DistributedPrefixSum's global index (one range shuffle) — this is
    // exactly the Gini/rank-statistics case that operator exists for.
    GraftQuery(
      "q191_gini_revenue",
      (s, dir) => {
        val t = Tables(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
        graft.operators.DistributedPrefixSum
          .scan(t, Seq("cents", "o_custkey"), Nil, idxName = "i")
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).as("sx"),
            sum(expr("(i * cents) div 1000000000")).as("hi"),
            sum(expr("(i * cents) % 1000000000")).as("lo"))
          .select(col("n"), (col("sx").cast("double") / 100.0).as("revenue"),
            round(
              expr("CAST(CAST(hi AS DECIMAL(38,0)) * 1000000000 + lo AS DOUBLE)")
                * 2.0 / (col("n").cast("double") * col("sx").cast("double"))
                - (col("n") + 1).cast("double") / col("n").cast("double"),
              6).as("gini"))
      },
      Some("""WITH t AS (
        |  SELECT o_custkey,
        |    SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT cents,
        |    CAST(row_number() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS i
        |  FROM t)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(cents) AS DOUBLE) / 100.0 AS revenue,
        |  round(CAST(SUM(CAST(i AS HUGEINT) * cents) AS DOUBLE) * 2.0
        |        / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(cents) AS DOUBLE))
        |      - CAST(COUNT(*) + 1 AS DOUBLE) / COUNT(*), 6) AS gini
        |FROM r""".stripMargin)),

    // Percentile envelope over time — p10/p50/p90 of order value per ship
    // YEAR: the control-chart view that distinguishes level drift from
    // spread drift (q110/q165 are its categorical siblings). q57
    // interpolation parity; one shuffle by year.
    GraftQuery(
      "q198_percentile_envelope",
      (s, dir) => {
        Tables(s, dir, "orders")
          .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
          .agg(count(lit(1)).as("n_orders"),
            round(expr("percentile(o_totalprice, 0.1)"), 4).as("p10"),
            round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
            round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"))
          .orderBy("yr")
      },
      Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  round(quantile_cont(o_totalprice, 0.1), 4) AS p10,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90
        |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin)),

    // Functional-dependency audit — schema inference's yes/no question:
    // does X determine Y in the data? Violations = keys whose dependent
    // column takes >1 value. Checked for a TRUE dependency
    // (orderkey→custkey) and a FALSE one (custkey→priority) so both
    // answers are pinned; countDistinct per key then one rollup.
    GraftQuery(
      "q199_functional_dependency",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        def audit(name: String, kCol: String, vCol: String) = o
          .groupBy(col(kCol)).agg(countDistinct(col(vCol)).as("nv"))
          .agg(count(lit(1)).as("n_keys"),
            sum(when(col("nv") > 1, 1L).otherwise(0L)).as("n_violations"))
          .select(lit(name).as("dependency"), col("n_keys"), col("n_violations"),
            (col("n_violations") === 0).cast("boolean").as("holds"))
        audit("o_custkey->o_orderpriority", "o_custkey", "o_orderpriority")
          .unionAll(audit("o_orderkey->o_custkey", "o_orderkey", "o_custkey"))
          .orderBy("dependency")
      },
      Some {
        def one(name: String, k: String, v: String) =
          s"""SELECT '$name' AS dependency,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(CASE WHEN nv > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violations,
             SUM(CASE WHEN nv > 1 THEN 1 ELSE 0 END) = 0 AS holds
             FROM (SELECT $k, COUNT(DISTINCT $v) AS nv FROM orders GROUP BY $k)"""
        one("o_custkey->o_orderpriority", "o_custkey", "o_orderpriority") +
          " UNION ALL " + one("o_orderkey->o_custkey", "o_orderkey", "o_custkey") +
          " ORDER BY dependency"
      }),

    // Pipeline readiness report — the single green/red row a data release
    // gate prints: referential orphans, exact duplicate rate, non-ASCII
    // fraction, and split balance, each recomputed inline from its gate's
    // exact definition (q163/q186/q196/q73 shapes condensed). One row,
    // every number integer-derived.
    GraftQuery(
      "q200_readiness_report",
      (s, dir) => {
        val hexpos = graft.queries.hexDigitVal _
        val orphans = Tables(s, dir, "customer")
          .join(Tables(s, dir, "nation").select(col("n_nationkey")),
            col("c_nationkey") === col("n_nationkey"), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
        val docs = Tables(s, dir, "documents")
        val dups = docs.groupBy(md5(col("text")).as("h")).agg(count(lit(1)).as("n"))
          .agg(sum(col("n") - 1).as("n_dups"), sum(col("n")).as("n_docs"))
        val ascii = docs.select(
            length(col("text")).cast("long").as("n"),
            (length(col("text")) -
              length(regexp_replace(col("text"), "[^ -~]", ""))).cast("long")
              .as("na"))
          .agg(sum(col("n")).as("n_chars"), sum(col("na")).as("n_nonascii"))
        val h = md5(col("doc_id").cast("string"))
        val split = docs
          .withColumn("bucket",
            (hexpos(substring(h, 1, 1)) * 16 + hexpos(substring(h, 2, 1))).cast("long"))
          .agg(sum(when(col("bucket") < 205, 1L).otherwise(0L)).as("n_train"),
            sum(when(col("bucket") >= 205 && col("bucket") < 230, 1L).otherwise(0L))
              .as("n_val"),
            sum(when(col("bucket") >= 230, 1L).otherwise(0L)).as("n_test"))
        orphans.crossJoin(dups).crossJoin(ascii).crossJoin(split)
          .select(col("n_orphans"),
            round(col("n_dups").cast("double") / col("n_docs"), 6).as("dup_rate"),
            round(col("n_nonascii").cast("double") / col("n_chars"), 6)
              .as("nonascii_frac"),
            col("n_train"), col("n_val"), col("n_test"),
            (col("n_orphans") === 0 && col("n_train") > col("n_val")
              && col("n_val") > 0 && col("n_test") > 0).as("ready"))
      },
      Some("""WITH orph AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_orphans FROM customer
        |  WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)),
        |dups AS (
        |  SELECT CAST(SUM(n - 1) AS BIGINT) AS n_dups,
        |    CAST(SUM(n) AS BIGINT) AS n_docs
        |  FROM (SELECT md5(text) AS h, COUNT(*) AS n FROM documents GROUP BY 1)),
        |a AS (
        |  SELECT CAST(SUM(length(text)) AS BIGINT) AS n_chars,
        |    CAST(SUM(length(text)
        |      - length(regexp_replace(text, '[^ -~]', '', 'g'))) AS BIGINT)
        |      AS n_nonascii
        |  FROM documents),
        |sp AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN b < 205 THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
        |    CAST(SUM(CASE WHEN b >= 205 AND b < 230 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_val,
        |    CAST(SUM(CASE WHEN b >= 230 THEN 1 ELSE 0 END) AS BIGINT) AS n_test
        |  FROM (SELECT
        |    (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 +
        |    (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS b
        |    FROM documents))
        |SELECT n_orphans,
        |  round(CAST(n_dups AS DOUBLE) / n_docs, 6) AS dup_rate,
        |  round(CAST(n_nonascii AS DOUBLE) / n_chars, 6) AS nonascii_frac,
        |  n_train, n_val, n_test,
        |  (n_orphans = 0 AND n_train > n_val AND n_val > 0 AND n_test > 0) AS ready
        |FROM orph, dups, a, sp""".stripMargin)),

    // Market-concentration HHI per nation — Herfindahl index of customer
    // order shares: HHI = Σcᵢ²/(Σc)² from exact integer count moments
    // (cᵢ² sums fit Long to ~3·10⁹ orders per customer), one division at
    // the end. 1/n_customers = perfectly even; 1 = one customer owns the
    // nation. The dependency-risk metric procurement teams track.
    GraftQuery(
      "q201_hhi_concentration",
      (s, dir) => {
        val counts = Tables(s, dir, "orders")
          .join(broadcast(Tables(s, dir, "customer")
            .select(col("c_custkey"), col("c_nationkey"))),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey"), col("o_custkey"))
          .agg(count(lit(1)).as("c"))
        counts.groupBy(col("c_nationkey").cast("long").as("nationkey"))
          .agg(count(lit(1)).as("n_customers"),
            sum(col("c")).as("n_orders"),
            sum(col("c") * col("c")).as("scc"))
          .select(col("nationkey"), col("n_customers"), col("n_orders"),
            round(col("scc").cast("double")
              / (col("n_orders").cast("double") * col("n_orders").cast("double")), 6)
              .as("hhi"))
          .orderBy("nationkey")
      },
      Some("""WITH c AS (
        |  SELECT c_nationkey, o_custkey, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2)
        |SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(c) AS BIGINT) AS n_orders,
        |  round(CAST(SUM(c * c) AS DOUBLE)
        |        / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE)), 6) AS hhi
        |FROM c GROUP BY 1 ORDER BY nationkey""".stripMargin)),

    // Ranking stability across time halves — overlap@10 of brands by
    // revenue between the early and late half of the ship-date range:
    // stable rankings mean drift-free popularity features. Both top-10
    // lists are exact (cent sums, total-order tiebreaks); the single
    // output row counts the intersection.
    GraftQuery(
      "q202_rank_stability",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val li = Tables(s, dir, "lineitem")
          .join(broadcast(Tables(s, dir, "part").select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_brand"),
            expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("price_c"),
            expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))").as("ship_us"))
        val mid = li.agg(expr("(min(ship_us) + max(ship_us)) div 2").as("mid_us"))
        val marked = li.crossJoin(broadcast(mid))
          .withColumn("half", when(col("ship_us") <= col("mid_us"), "early")
            .otherwise("late"))
        val ranked = marked.groupBy(col("half"), col("p_brand"))
          .agg(sum(col("price_c")).as("cents"))
          .withColumn("rnk", row_number().over(
            Window.partitionBy("half").orderBy(col("cents").desc, col("p_brand"))))
          .filter(col("rnk") <= 10)
        val early = ranked.filter(col("half") === "early").select(col("p_brand"))
        val late = ranked.filter(col("half") === "late").select(col("p_brand"))
        early.join(late, Seq("p_brand"))
          .agg(count(lit(1)).as("overlap_at_10"))
          .select(col("overlap_at_10"),
            round(col("overlap_at_10").cast("double") / 10.0, 6).as("stability"))
      },
      Some("""WITH li AS (
        |  SELECT p_brand,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c, l_shipdate
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |m AS (SELECT (min(epoch_us(l_shipdate)) + max(epoch_us(l_shipdate))) // 2
        |        AS mid_us FROM li),
        |h AS (
        |  SELECT p_brand,
        |    CASE WHEN epoch_us(l_shipdate) <= (SELECT mid_us FROM m)
        |         THEN 'early' ELSE 'late' END AS half,
        |    price_c
        |  FROM li),
        |r AS (
        |  SELECT half, p_brand,
        |    row_number() OVER (PARTITION BY half
        |      ORDER BY SUM(price_c) DESC, p_brand) AS rnk
        |  FROM h GROUP BY half, p_brand)
        |SELECT CAST(COUNT(*) AS BIGINT) AS overlap_at_10,
        |  round(CAST(COUNT(*) AS DOUBLE) / 10.0, 6) AS stability
        |FROM (SELECT p_brand FROM r WHERE half = 'early' AND rnk <= 10) e
        |JOIN (SELECT p_brand FROM r WHERE half = 'late' AND rnk <= 10) l
        |  USING (p_brand)""".stripMargin)),

    // ABC revenue classification — parts ranked by revenue, split at the
    // classic 80%/95% cumulative-share cuts. The global descending
    // cumulative sum runs through DistributedPrefixSum (sort key = NEGATED
    // cents so the range scan orders revenue-high-first; no
    // single-partition window), and the class predicate cross-multiplies
    // `run·100 ≤ cut·total` so the split is integer-exact. Part-level
    // frame: one scan of lineitem feeds it.
    GraftQuery(
      "q237_abc_classification",
      (s, dir) => {
        val rev = Tables(s, dir, "lineitem")
          .groupBy(col("l_partkey"))
          .agg(sum(expr("CAST(round(l_extendedprice * (1 - l_discount) * 100)" +
            " AS BIGINT)")).as("cents"))
          .withColumn("negc", -col("cents"))
        // the scan's pass-1 collect already totals `cents` — the former
        // separate `rev.agg(...)` re-ran the whole lineitem revenue
        // aggregation a second time just for the grand total
        val res = graft.operators.DistributedPrefixSum
          .scanWithTotals(rev, Seq("negc", "l_partkey"), Seq("cents"))
        val total = res.totalSums("cents")
        res.df
          .withColumn("cls",
            when(col("run_cents") * 100 <= lit(total) * 80, "A")
              .when(col("run_cents") * 100 <= lit(total) * 95, "B")
              .otherwise("C"))
          .groupBy(col("cls"))
          .agg(count(lit(1)).as("n_parts"),
            (sum(col("cents")).cast("double") / 100.0).as("revenue"),
            round(sum(col("cents")).cast("double")
              / lit(total).cast("double"), 6).as("share"))
          .orderBy("cls")
      },
      Some("""WITH rev AS (
        |  SELECT l_partkey,
        |    SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
        |      AS cents
        |  FROM lineitem GROUP BY 1),
        |r AS (
        |  SELECT l_partkey, cents,
        |    SUM(cents) OVER (ORDER BY cents DESC, l_partkey) AS run,
        |    SUM(cents) OVER () AS total
        |  FROM rev),
        |c AS (
        |  SELECT CASE WHEN run * 100 <= total * 80 THEN 'A'
        |              WHEN run * 100 <= total * 95 THEN 'B'
        |              ELSE 'C' END AS cls,
        |    cents, total
        |  FROM r)
        |SELECT cls, CAST(COUNT(*) AS BIGINT) AS n_parts,
        |  CAST(SUM(cents) AS DOUBLE) / 100.0 AS revenue,
        |  round(CAST(SUM(cents) AS DOUBLE) / CAST(MAX(total) AS DOUBLE), 6)
        |    AS share
        |FROM c GROUP BY cls ORDER BY cls""".stripMargin)),

    // FK fan-out profile — the cardinality histograms a 100 TB join plan
    // is sized from: how many orders per customer, how many lines per
    // order, as (relation, fanout, n_parents) rows in one result. Two
    // hash aggregates per edge, unioned by name; the profile is what
    // decides broadcast-vs-shuffle and salting thresholds before any big
    // join runs.
    GraftQuery(
      "q238_fk_fanout_profile",
      (s, dir) => {
        def profile(df: org.apache.spark.sql.DataFrame, key: String,
            rel: String) = df
          .groupBy(col(key)).agg(count(lit(1)).as("fanout"))
          .groupBy(col("fanout")).agg(count(lit(1)).as("n_parents"))
          .withColumn("relation", lit(rel))
        profile(Tables(s, dir, "orders").select(col("o_custkey")),
            "o_custkey", "orders_per_customer")
          .unionByName(
            profile(Tables(s, dir, "lineitem").select(col("l_orderkey")),
              "l_orderkey", "lines_per_order"))
          .select(col("relation"), col("fanout"), col("n_parents"))
          .orderBy("relation", "fanout")
      },
      Some("""WITH opc AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS fanout
        |  FROM orders GROUP BY o_custkey),
        |lpo AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS fanout
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT 'orders_per_customer' AS relation, fanout,
        |  CAST(COUNT(*) AS BIGINT) AS n_parents
        |FROM opc GROUP BY 2
        |UNION ALL
        |SELECT 'lines_per_order' AS relation, fanout,
        |  CAST(COUNT(*) AS BIGINT) AS n_parents
        |FROM lpo GROUP BY 2
        |ORDER BY relation, fanout""".stripMargin)),

    // Value reconciliation — does each order's header total equal the sum
    // of its line extended prices? Key-level referential integrity (q163)
    // says the rows exist; THIS audit says the MONEY agrees. Exact cent
    // comparison per order, mismatches bucketed by signed relative error.
    // (In this generator headers and lines are drawn independently, so the
    // audit quantifies systematic disagreement rather than asserting zero
    // — which is exactly what a reconciliation report does.)
    GraftQuery(
      "q251_value_reconciliation",
      (s, dir) => {
        val lines = Tables(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("line_c"))
        val o = Tables(s, dir, "orders")
          .select(col("o_orderkey"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("hdr_c"))
        o.join(lines, col("o_orderkey") === col("l_orderkey"))
          .withColumn("bucket",
            when(col("line_c") === col("hdr_c"), "exact")
              .when(col("line_c") * 10 < col("hdr_c") * 9, "lines_under_90pct")
              .when(col("line_c") * 10 > col("hdr_c") * 11, "lines_over_110pct")
              .otherwise("within_10pct"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_orders"),
            (sum(col("hdr_c") - col("line_c")).cast("double") / 100.0)
              .as("total_gap"))
          .orderBy("bucket")
      },
      Some("""WITH l AS (
        |  SELECT l_orderkey,
        |    SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS line_c
        |  FROM lineitem GROUP BY 1),
        |o AS (
        |  SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS hdr_c
        |  FROM orders),
        |j AS (
        |  SELECT CASE WHEN line_c = hdr_c THEN 'exact'
        |              WHEN line_c * 10 < hdr_c * 9 THEN 'lines_under_90pct'
        |              WHEN line_c * 10 > hdr_c * 11 THEN 'lines_over_110pct'
        |              ELSE 'within_10pct' END AS bucket,
        |    hdr_c, line_c
        |  FROM o JOIN l ON o_orderkey = l_orderkey)
        |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(hdr_c - line_c) AS DOUBLE) / 100.0 AS total_gap
        |FROM j GROUP BY bucket ORDER BY bucket""".stripMargin)),

    // Double-submit audit — customers placing MULTIPLE orders on the same
    // calendar day (the classic dedup-at-ingest smell): per multiplicity,
    // how many (customer, day) pairs and how much revenue rides on the
    // possibly-duplicated submissions beyond the first (excess = all but
    // the cheapest order per pair, exact cents via sum − min).
    GraftQuery(
      "q252_double_submit_audit",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
          .select(col("o_custkey"),
            expr("datediff(o_orderdate, DATE '1970-01-01')").cast("long").as("day"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
        o.groupBy(col("o_custkey"), col("day"))
          .agg(count(lit(1)).as("k"), sum(col("c")).as("sc"), min(col("c")).as("mc"))
          .filter(col("k") >= 2)
          .groupBy(col("k"))
          .agg(count(lit(1)).as("n_pairs"),
            ((sum(col("sc")) - sum(col("mc"))).cast("double") / 100.0)
              .as("excess_revenue"))
          .orderBy("k")
      },
      Some("""WITH o AS (
        |  SELECT o_custkey,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS c
        |  FROM orders),
        |g AS (
        |  SELECT o_custkey, day, CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(c) AS BIGINT) AS sc, CAST(MIN(c) AS BIGINT) AS mc
        |  FROM o GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT k, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(SUM(sc) - SUM(mc) AS DOUBLE) / 100.0 AS excess_revenue
        |FROM g GROUP BY k ORDER BY k""".stripMargin)),

    // Freshness audit — per time-bearing table: row count, latest event
    // day, and staleness relative to the freshest table in the lake (the
    // "did yesterday's load land everywhere" ops gate). Each table
    // contributes one scan-and-max row; the cross-table max is a window
    // over the 3-row frame. Epoch-day integers end to end.
    GraftQuery(
      "q270_freshness_audit",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        def probe(df: org.apache.spark.sql.DataFrame, table: String, dayExpr: String) =
          df.agg(count(lit(1)).as("n_rows"),
              max(expr(dayExpr)).cast("long").as("max_day"))
            .withColumn("table", lit(table))
        val rows = probe(Tables(s, dir, "orders"), "orders",
            "datediff(o_orderdate, DATE '1970-01-01')")
          .unionByName(probe(Tables(s, dir, "lineitem"), "lineitem",
            "datediff(l_shipdate, DATE '1970-01-01')"))
          .unionByName(probe(Tables(s, dir, "events"), "events",
            "ts div 86400000000000"))
        rows
          .withColumn("lake_max", max(col("max_day")).over(Window.partitionBy()))
          .select(col("table"), col("n_rows"), col("max_day"),
            (col("lake_max") - col("max_day")).as("staleness_days"))
          .orderBy("table")
      },
      Some("""WITH r AS (
        |  SELECT 'orders' AS "table", CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(MAX(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS BIGINT)
        |      AS max_day
        |  FROM orders
        |  UNION ALL
        |  SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
        |    CAST(MAX(CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'events', CAST(COUNT(*) AS BIGINT),
        |    CAST(MAX(epoch_us(ts) // 86400000000) AS BIGINT)
        |  FROM events)
        |SELECT "table", n_rows, max_day,
        |  CAST(MAX(max_day) OVER () - max_day AS BIGINT) AS staleness_days
        |FROM r ORDER BY "table"""".stripMargin))
  )
}
