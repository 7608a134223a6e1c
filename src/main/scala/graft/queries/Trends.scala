package graft.queries

import graft.{GraftQuery, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-7 surface: statistical trend and association mining — per-group
  * closed-form OLS regression, wide-to-long reshaping with distribution
  * ranks (percent_rank / cume_dist), and market-basket association rules
  * (support / confidence / lift).
  *
  * Determinism playbook: every moment that crosses rows is an exact sum —
  * BIGINT for integer series, DECIMAL(18,2|4) for money — and floating
  * point enters only in the final per-row division, which both engines
  * evaluate identically on identical inputs.
  *
  * Scale notes:
  *   - q117: two partial+final aggregations (month rollup, then moment
  *     rollup) — the regression itself never sees row-level data; the
  *     moments are 6 numbers per group.
  *   - q119: `stack` is a row-local generator (no shuffle); the rank
  *     windows run over the 12-row aggregate, not the fact table.
  *   - q122: basket pair fanout is sum of C(basket, 2) — linear in orders
  *     for bounded baskets; item counts broadcast to the pair stream, so
  *     the only big shuffle is the pair count itself. The support floor
  *     prunes before the lift math.
  */
object Trends extends QueryPack {

  def queries: Seq[GraftQuery] = Seq(

    // Per-nation revenue trend: closed-form OLS (slope, intercept) of
    // monthly revenue against month index. Moment sums are exact (BIGINT
    // x / DECIMAL y), so num/den reach the final double division
    // bit-identical in both engines.
    GraftQuery(
      "q117_trend_ols",
      (s, dir) => {
        val m = Tables(s, dir, "orders")
          .join(broadcast(Tables(s, dir, "customer")),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey").as("nk"),
            ((year(col("o_orderdate")) - 1990) * 12 + month(col("o_orderdate")) - 1)
              .cast("long").as("x"))
          .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("y"))
        val mo = m.groupBy("nk").agg(
          count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"))
        val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
        val den = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
        val slope = num / den
        mo.join(broadcast(Tables(s, dir, "nation")),
            col("nk") === col("n_nationkey"))
          .select(col("n_name").as("nation"), col("n").as("n_months"),
            round(slope, 6).as("slope"),
            round((col("sy").cast("double") - slope * col("sx")) / col("n"), 4)
              .as("intercept"))
          .orderBy("nation")
      },
      Some("""WITH m AS (
        |  SELECT c.c_nationkey AS nk,
        |    (year(o.o_orderdate) - 1990) * 12 + month(o.o_orderdate) - 1 AS x,
        |    SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS y
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |s AS (
        |  SELECT nk, count(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx,
        |    SUM(y) AS sy, SUM(x * y) AS sxy
        |  FROM m GROUP BY 1)
        |SELECT nt.n_name AS nation, CAST(s.n AS BIGINT) AS n_months,
        |  round(CAST(s.n * s.sxy - s.sx * s.sy AS DOUBLE)
        |      / CAST(s.n * s.sxx - s.sx * s.sx AS DOUBLE), 6) AS slope,
        |  round((CAST(s.sy AS DOUBLE)
        |      - CAST(s.n * s.sxy - s.sx * s.sy AS DOUBLE)
        |        / CAST(s.n * s.sxx - s.sx * s.sx AS DOUBLE) * s.sx) / s.n, 4)
        |    AS intercept
        |FROM s JOIN nation nt ON s.nk = nt.n_nationkey
        |ORDER BY nation""".stripMargin)),

    // Inverted index construction over the document corpus: per-term
    // document frequency, total term frequency, and the head of the
    // posting list (first 5 doc ids). The posting head is bounded BEFORE
    // collect_list by a per-term row_number, so no task ever materialises
    // a full posting list — at corpus scale the postings stay distributed
    // and only the k-bounded head ever reaches a single row.
    GraftQuery(
      "q118_inverted_index",
      (s, dir) => {
        val tok = Tables.spread(Tables(s, dir, "documents"), "doc_id")
          .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
          .filter(col("term") =!= "")
        // one tokenize pass + one (term, doc) shuffle feeds BOTH outputs:
        // stats and posting heads derive from the materialised pair frame
        // instead of re-exploding the corpus per consumer
        val perDoc = tok.groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
          .localCheckpoint()
        val stats = perDoc.groupBy("term")
          .agg(count(lit(1)).as("df"), sum(col("tf")).as("tf_total"))
        val w = Window.partitionBy("term").orderBy("doc_id")
        val post = perDoc.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
          .groupBy("term")
          .agg(array_join(expr(
            "transform(array_sort(collect_list(doc_id)), x -> cast(x as string))"),
            ";").as("postings_head"))
        stats.join(post, "term")
          .select(col("term"), col("df"), col("tf_total"), col("postings_head"))
          .orderBy(col("df").desc, col("term"))
          .limit(50)
      },
      Some("""WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents),
        |t AS (SELECT doc_id, term FROM tok WHERE term <> ''),
        |stats AS (
        |  SELECT term, count(DISTINCT doc_id) AS df, count(*) AS tf_total
        |  FROM t GROUP BY 1),
        |pd AS (SELECT DISTINCT term, doc_id FROM t),
        |rn AS (
        |  SELECT term, doc_id,
        |    row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
        |  FROM pd),
        |post AS (
        |  SELECT term, string_agg(CAST(doc_id AS VARCHAR), ';' ORDER BY doc_id)
        |    AS postings_head
        |  FROM rn WHERE rn <= 5 GROUP BY 1)
        |SELECT s.term, CAST(s.df AS BIGINT) AS df,
        |  CAST(s.tf_total AS BIGINT) AS tf_total, p.postings_head
        |FROM stats s JOIN post p USING (term)
        |ORDER BY df DESC, term LIMIT 50""".stripMargin)),

    // Wide-to-long reshape (`stack`) of lineitem's four measures, then the
    // distribution-rank window functions (percent_rank, cume_dist) over
    // each measure's per-flag totals — the unpivot + rank SQL surface.
    GraftQuery(
      "q119_unpivot_rank",
      (s, dir) => {
        val long = Tables(s, dir, "lineitem").select(col("l_returnflag"),
          expr("""stack(4,
            'discount', l_discount, 'extprice', l_extendedprice,
            'quantity', l_quantity, 'tax', l_tax) as (measure, value)"""))
        val agg = long.groupBy("measure", "l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 4))).cast("double").as("total"))
        val w = Window.partitionBy("measure").orderBy("total")
        agg.select(col("measure"), col("l_returnflag").as("rflag"),
            col("n"), col("total"),
            round(percent_rank().over(w), 6).as("pr"),
            round(cume_dist().over(w), 6).as("cd"))
          .orderBy("measure", "rflag")
      },
      Some("""WITH long_ AS (
        |  SELECT l_returnflag, 'discount' AS measure, l_discount AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'extprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'quantity', l_quantity FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'tax', l_tax FROM lineitem),
        |agg AS (
        |  SELECT measure, l_returnflag AS rflag, count(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
        |  FROM long_ GROUP BY 1, 2)
        |SELECT measure, rflag, CAST(n AS BIGINT) AS n, total,
        |  round(percent_rank() OVER (PARTITION BY measure ORDER BY total), 6) AS pr,
        |  round(cume_dist() OVER (PARTITION BY measure ORDER BY total), 6) AS cd
        |FROM agg ORDER BY measure, rflag""".stripMargin)),

    // Market-basket association: part pairs co-purchased in >= 3 orders,
    // scored by confidence and lift from exact basket counts — top-25 by
    // lift. The "frequently bought together" mining primitive.
    GraftQuery(
      "q122_market_basket",
      (s, dir) => {
        // ONE exchange of the fact table builds the per-basket DISTINCT
        // item set; totals, item counts and the pair expansion all derive
        // from the materialized baskets (the former distinct + self-join
        // phrasing exchanged the fact frame three times). Pair fan-out is
        // basket-local — C(|basket|, 2), the same bound the self-join's
        // per-key product carried — and partial-aggregates map-side.
        val baskets = Tables(s, dir, "lineitem")
          .select(col("l_orderkey").as("k"), col("l_partkey").as("p"))
          .groupBy("k").agg(collect_set(col("p")).as("ps"))
          .localCheckpoint()
        val totals = baskets.agg(count(lit(1)).as("nb"))
        val itemCounts = baskets.select(explode(col("ps")).as("p"))
          .groupBy("p").agg(count(lit(1)).as("np"))
        val pairs = graft.operators.BasketPairs.explodePairsDistinct(baskets, "ps")
          .groupBy("p1", "p2").agg(count(lit(1)).as("nab"))
          .where(col("nab") >= 3)
        pairs
          .join(broadcast(itemCounts.withColumnRenamed("p", "p1")
            .withColumnRenamed("np", "np1")), "p1")
          .join(broadcast(itemCounts.withColumnRenamed("p", "p2")
            .withColumnRenamed("np", "np2")), "p2")
          .crossJoin(broadcast(totals))
          .select(col("p1"), col("p2"), col("nab"),
            round(col("nab").cast("double") / col("np1"), 4).as("confidence"),
            round((col("nab") * col("nb")).cast("double")
              / (col("np1") * col("np2")), 4).as("lift"))
          .orderBy(col("lift").desc, col("p1"), col("p2"))
          .limit(25)
      },
      Some("""WITH items AS (
        |  SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem),
        |totals AS (SELECT count(DISTINCT k) AS nb FROM items),
        |ic AS (SELECT p, count(*) AS np FROM items GROUP BY 1),
        |pairs AS (
        |  SELECT a.p AS p1, b.p AS p2, count(*) AS nab
        |  FROM items a JOIN items b ON a.k = b.k AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT p.p1, p.p2, CAST(p.nab AS BIGINT) AS nab,
        |  round(CAST(p.nab AS DOUBLE) / i1.np, 4) AS confidence,
        |  round(CAST(p.nab * t.nb AS DOUBLE) / (i1.np * i2.np), 4) AS lift
        |FROM pairs p
        |JOIN ic i1 ON p.p1 = i1.p JOIN ic i2 ON p.p2 = i2.p
        |CROSS JOIN totals t
        |ORDER BY lift DESC, p1, p2 LIMIT 25""".stripMargin)),

    // Theil–Sen robust trend — the median of all pairwise slopes between
    // monthly revenue points (84 months → 3 486 pairs), immune to the
    // outlier months that drag OLS (q117) around. The pair fan-out runs at
    // the MONTH level (a 84-row frame after one scan's aggregation — the
    // pairwise join never touches row-level data), the median is the exact
    // middle element(s) picked by row_number (no percentile interpolation
    // ambiguity), and slopes divide exact cent Longs only at the final
    // per-pair step.
    GraftQuery(
      "q231_theil_sen_trend",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val monthly = Tables(s, dir, "orders")
          .groupBy(expr("(year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1")
            .cast("long").as("m"))
          .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
        val a = monthly.select(col("m").as("m1"), col("cents").as("c1"))
        val b = monthly.select(col("m").as("m2"), col("cents").as("c2"))
        val slopes = a.join(b, col("m1") < col("m2"))
          .select(col("m1"), col("m2"),
            ((col("c2") - col("c1")).cast("double")
              / ((col("m2") - col("m1")).cast("double") * 100.0)).as("slope"))
        val w = Window.orderBy(col("slope").asc, col("m1").asc, col("m2").asc)
        slopes
          .withColumn("rnk", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(Window.partitionBy()))
          .filter(col("rnk") === expr("(n + 1) div 2")
            || col("rnk") === expr("(n + 2) div 2"))
          .agg(max(col("n")).as("n_pairs"),
            round(avg(col("slope")), 6).as("median_slope"))
      },
      Some("""WITH monthly AS (
        |  SELECT CAST((year(o_orderdate) - 1995) * 12
        |              + month(o_orderdate) - 1 AS BIGINT) AS m,
        |    SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        |  FROM orders GROUP BY 1),
        |s AS (
        |  SELECT a.m AS m1, b.m AS m2,
        |    CAST(b.cents - a.cents AS DOUBLE)
        |      / (CAST(b.m - a.m AS DOUBLE) * 100.0) AS slope
        |  FROM monthly a JOIN monthly b ON a.m < b.m),
        |r AS (
        |  SELECT *, CAST(row_number() OVER (ORDER BY slope, m1, m2) AS BIGINT) AS rnk,
        |    COUNT(*) OVER () AS n
        |  FROM s)
        |SELECT CAST(MAX(n) AS BIGINT) AS n_pairs,
        |  round(AVG(slope), 6) AS median_slope
        |FROM r WHERE rnk = (n + 1) // 2 OR rnk = (n + 2) // 2""".stripMargin)),

    // Log–log price elasticity per brand — corr(ln qty, ln unit-price),
    // the economist's demand-curve slope screen. Determinism: each row's
    // logs are SCALED TO BIGINT micro-nats (round(ln·10⁶)) so every
    // cross-row moment is an exact integer sum (q211's hi/lo split); a
    // 1-ULP libm difference between engines can flip one row's scaled
    // value by ±1 at worst, perturbing corr by ~10⁻¹³ — invisible at
    // round(6). No float ever crosses rows.
    GraftQuery(
      "q233_log_elasticity",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
          .join(broadcast(Tables(s, dir, "part")
            .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_brand").as("brand"),
            expr("CAST(round(ln(l_quantity) * 1000000) AS BIGINT)").as("a"),
            expr("CAST(round(ln(l_extendedprice / l_quantity) * 1000000) AS BIGINT)")
              .as("b"))
        val m = li.groupBy(col("brand"))
          .agg(count(lit(1)).as("n"),
            sum(col("a")).as("sa"), sum(col("b")).as("sb"),
            sum(expr("(a * a) div 1000000000")).as("haa"),
            sum(expr("(a * a) % 1000000000")).as("laa"),
            sum(expr("(b * b) div 1000000000")).as("hbb"),
            sum(expr("(b * b) % 1000000000")).as("lbb"),
            sum(expr("(a * b) div 1000000000")).as("hab"),
            sum(expr("(a * b) % 1000000000")).as("lab"))
        def mom(h: String, l: String) = expr(
          s"CAST(CAST($h AS DECIMAL(38,0)) * 1000000000 + $l AS DOUBLE)")
        val n = col("n").cast("double")
        val sa = col("sa").cast("double")
        val sb = col("sb").cast("double")
        val num = n * mom("hab", "lab") - sa * sb
        val den = sqrt((n * mom("haa", "laa") - sa * sa)
          * (n * mom("hbb", "lbb") - sb * sb))
        m.select(col("brand"), col("n").as("n_lines"),
            round(num / den, 6).as("elasticity_corr"))
          .orderBy("brand")
      },
      Some("""WITH li AS (
        |  SELECT p_brand AS brand,
        |    CAST(round(ln(l_quantity) * 1000000) AS BIGINT) AS a,
        |    CAST(round(ln(l_extendedprice / l_quantity) * 1000000) AS BIGINT) AS b
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |m AS (
        |  SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(a) AS DOUBLE) AS sa, CAST(SUM(b) AS DOUBLE) AS sb,
        |    CAST(SUM(CAST(a AS HUGEINT) * a) AS DOUBLE) AS saa,
        |    CAST(SUM(CAST(b AS HUGEINT) * b) AS DOUBLE) AS sbb,
        |    CAST(SUM(CAST(a AS HUGEINT) * b) AS DOUBLE) AS sab
        |  FROM li GROUP BY 1)
        |SELECT brand, n AS n_lines,
        |  round((CAST(n AS DOUBLE) * sab - sa * sb)
        |        / sqrt((CAST(n AS DOUBLE) * saa - sa * sa)
        |               * (CAST(n AS DOUBLE) * sbb - sb * sb)), 6)
        |    AS elasticity_corr
        |FROM m ORDER BY brand""".stripMargin)),

    // Month-over-month growth ledger on an EXPLICIT month spine — every
    // (nation, month) cell exists (zero-filled via a generated series ×
    // the 25-nation dim, then a left join), so lag() computes growth
    // against the true previous calendar month, not the previous month
    // WITH data — the distinction q106's gap-fill interpolates over and a
    // growth report must not. Revenue stays exact cents until the single
    // growth division; spine bounds derive from the data (broadcast 1-row
    // max).
    GraftQuery(
      "q239_mom_growth_ledger",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val rev = Tables(s, dir, "orders")
          .join(Tables(s, dir, "customer")
            .select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"),
            expr("CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS BIGINT)")
              .as("m"))
          .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
        val bounds = rev.agg(max(col("m")).as("mmax"))
        val spine = Tables(s, dir, "nation").select(col("n_name"))
          .crossJoin(broadcast(bounds))
          .select(col("n_name"), explode(expr("sequence(CAST(0 AS BIGINT), mmax)")).as("m"))
        val filled = spine.join(rev, Seq("n_name", "m"), "left")
          .withColumn("cents", coalesce(col("cents"), lit(0L)))
        val w = Window.partitionBy("n_name").orderBy("m")
        filled
          .withColumn("prev", lag(col("cents"), 1).over(w))
          .select(col("n_name"), col("m"),
            (col("cents").cast("double") / 100.0).as("revenue"),
            when(col("prev") > 0,
              round((col("cents") - col("prev")).cast("double") * 100.0
                / col("prev").cast("double"), 4)).as("growth_pct"))
          .orderBy("n_name", "m")
      },
      Some("""WITH rev AS (
        |  SELECT n_name,
        |    CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1
        |      AS BIGINT) AS m,
        |    SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |spine AS (
        |  SELECT n_name, CAST(s.g AS BIGINT) AS m
        |  FROM nation, (SELECT unnest(generate_series(0,
        |    (SELECT MAX(m) FROM rev))) AS g) s),
        |filled AS (
        |  SELECT spine.n_name, spine.m, COALESCE(rev.cents, 0) AS cents
        |  FROM spine LEFT JOIN rev USING (n_name, m)),
        |l AS (
        |  SELECT *, lag(cents) OVER (PARTITION BY n_name ORDER BY m) AS prev
        |  FROM filled)
        |SELECT n_name, m, CAST(cents AS DOUBLE) / 100.0 AS revenue,
        |  CASE WHEN prev > 0 THEN
        |    round(CAST(cents - prev AS DOUBLE) * 100.0 / CAST(prev AS DOUBLE), 4)
        |  END AS growth_pct
        |FROM l ORDER BY n_name, m""".stripMargin)),

    // Revenue by customer age — each order year's revenue split by WHEN
    // the ordering customer was acquired (first-order year): the money
    // complement of q214's user-count growth accounting. One first-seen
    // aggregate joined back, exact cents, cohort share per cell.
    GraftQuery(
      "q253_revenue_by_customer_age",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val o = Tables(s, dir, "orders")
          .select(col("o_custkey"), expr("year(o_orderdate)").as("yr"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
        val firstSeen = o.groupBy(col("o_custkey")).agg(min(col("yr")).as("yr0"))
        o.join(firstSeen, Seq("o_custkey"))
          .withColumn("age", col("yr") - col("yr0"))
          .groupBy(col("yr"), col("age"))
          .agg(sum(col("c")).as("cents"), countDistinct(col("o_custkey")).as("n_customers"))
          .withColumn("share", round(col("cents").cast("double")
            / sum(col("cents")).over(Window.partitionBy("yr")), 6))
          .select(col("yr"), col("age"), col("n_customers"),
            (col("cents").cast("double") / 100.0).as("revenue"), col("share"))
          .orderBy("yr", "age")
      },
      Some("""WITH o AS (
        |  SELECT o_custkey, year(o_orderdate) AS yr,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS c
        |  FROM orders),
        |fs AS (SELECT o_custkey, MIN(yr) AS yr0 FROM o GROUP BY 1),
        |j AS (
        |  SELECT o.yr, o.yr - fs.yr0 AS age, o.o_custkey, o.c
        |  FROM o JOIN fs ON o.o_custkey = fs.o_custkey),
        |g AS (
        |  SELECT yr, age, CAST(SUM(c) AS BIGINT) AS cents,
        |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
        |  FROM j GROUP BY 1, 2)
        |SELECT CAST(yr AS INT) AS yr, CAST(age AS INT) AS age, n_customers,
        |  CAST(cents AS DOUBLE) / 100.0 AS revenue,
        |  round(CAST(cents AS DOUBLE)
        |        / CAST(SUM(cents) OVER (PARTITION BY yr) AS DOUBLE), 6) AS share
        |FROM g ORDER BY yr, age""".stripMargin)),

    // Peak revenue day per year through the custom physical operator —
    // TopKPerGroup at k=1 over (year → day, cents) finds each year's
    // biggest single day without a rank window (k rows per group per task
    // cross the shuffle), plus that day's share of its year from one
    // broadcast year-total join.
    GraftQuery(
      "q255_peak_day_per_year",
      (s, dir) => {
        val daily = Tables(s, dir, "orders")
          .groupBy(expr("year(o_orderdate)").cast("int").as("yr"),
            expr("datediff(o_orderdate, DATE '1970-01-01')").cast("long").as("day"))
          .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
        val yearly = daily.groupBy(col("yr")).agg(sum(col("cents")).as("ytot"))
        graft.plans.TopKPerGroup(daily, Seq("yr"),
            Seq(("cents", false), ("day", true)), k = 1)
          .join(broadcast(yearly), Seq("yr"))
          .select(col("yr"), col("day"),
            (col("cents").cast("double") / 100.0).as("peak_revenue"),
            round(col("cents").cast("double") / col("ytot").cast("double"), 6)
              .as("share_of_year"))
          .orderBy("yr")
      },
      Some("""WITH daily AS (
        |  SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1, 2),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY yr
        |      ORDER BY cents DESC, day) AS rnk,
        |    SUM(cents) OVER (PARTITION BY yr) AS ytot
        |  FROM daily)
        |SELECT yr, day, CAST(cents AS DOUBLE) / 100.0 AS peak_revenue,
        |  round(CAST(cents AS DOUBLE) / CAST(ytot AS DOUBLE), 6) AS share_of_year
        |FROM r WHERE rnk = 1 ORDER BY yr""".stripMargin)),

    // Frequent TRIPLES — q122's pairs extended one level, generated
    // basket-locally (each order's distinct brand set expands its own
    // C(d,3) candidates; d ≤ 25 brands structurally, far fewer per real
    // basket). The classic a-priori L1/L2 join-gating existed to bound the
    // fan-out of the level-wise self-joins; with local generation the
    // bound is structural and the gates prune nothing (downward closure
    // made them result-neutral — the oracle counts triples directly and
    // must agree). Support filter at the end is the oracle's own.
    GraftQuery(
      "q256_apriori_triples",
      (s, dir) => {
        // ONE exchange of the fact frame builds the per-basket DISTINCT
        // brand set; the former two-level a-priori join chain (items
        // self-joined into pairs, pairs extended into triples, L1/L2
        // support gates broadcast between the levels) exchanged the fact
        // frame four times to bound the JOIN fan-out it created. Basket-
        // local generation carries the bound structurally — C(|basket
        // brands|, 3), ≤ C(25, 3) at the 25-brand catalog and tiny for real
        // baskets — so the level gates that existed to tame the joins
        // prune nothing the expansion doesn't already avoid; the candidate
        // stream partial-aggregates map-side and the final support filter
        // (the oracle's own semantics) is unchanged. Downward closure made
        // the gates result-neutral, which is exactly why dropping them is
        // safe.
        val baskets = Tables(s, dir, "lineitem")
          .join(broadcast(Tables(s, dir, "part")
            .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("k"), col("p_brand").as("b"))
          .groupBy("k").agg(collect_set(col("b")).as("bs"))
          .localCheckpoint()
        val nb = baskets.agg(count(lit(1)).as("nb"))
        val t = graft.operators.BasketPairs.explodeTriplesDistinct(baskets, "bs")
        t.groupBy(col("b1"), col("b2"), col("b3")).agg(count(lit(1)).as("cnt"))
          .crossJoin(broadcast(nb)).filter(col("cnt") * 1000 >= col("nb") * 3)
          .select(col("b1"), col("b2"), col("b3"), col("cnt"),
            round(col("cnt").cast("double") / col("nb").cast("double"), 6)
              .as("support"))
          .orderBy(col("cnt").desc, col("b1"), col("b2"), col("b3"))
          .limit(10)
      },
      Some("""WITH items AS (
        |  SELECT DISTINCT l_orderkey AS k, p_brand AS b
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |tot AS (SELECT CAST(COUNT(DISTINCT k) AS BIGINT) AS nb FROM items),
        |t AS (
        |  SELECT a.b AS b1, c.b AS b2, d.b AS b3, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM items a
        |  JOIN items c ON a.k = c.k AND a.b < c.b
        |  JOIN items d ON a.k = d.k AND c.b < d.b
        |  GROUP BY 1, 2, 3)
        |SELECT b1, b2, b3, cnt,
        |  round(CAST(cnt AS DOUBLE) / CAST(nb AS DOUBLE), 6) AS support
        |FROM t, tot WHERE cnt * 1000 >= nb * 3
        |ORDER BY cnt DESC, b1, b2, b3 LIMIT 10""".stripMargin)),

    // Autocorrelation of the monthly revenue series at lags 1–3 — the
    // seasonality/persistence screen before any forecasting model. Pairing
    // is a month-level self-join (84 rows), every moment is an exact
    // DECIMAL(38,0) product sum over cents, and each lag's Pearson r is
    // one final float expression.
    GraftQuery(
      "q258_revenue_autocorrelation",
      (s, dir) => {
        val monthly = Tables(s, dir, "orders")
          .groupBy(expr("CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS BIGINT)")
            .as("m"))
          .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("c"))
        val lags = Seq(1, 2, 3).map { k =>
          monthly.select(col("m"), col("c").as("x"))
            .join(monthly.select((col("m") + k).as("m"), col("c").as("y")), Seq("m"))
            .agg(count(lit(1)).as("n"),
              sum(col("x")).as("sx"), sum(col("y")).as("sy"),
              sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
              sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
              sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
            .withColumn("lag", lit(k))
        }.reduce(_ unionByName _)
        lags.select(col("lag"), col("n"),
            round((col("n").cast("double") * col("sxy").cast("double")
              - col("sx").cast("double") * col("sy").cast("double"))
              / sqrt((col("n").cast("double") * col("sxx").cast("double")
                - col("sx").cast("double") * col("sx").cast("double"))
                * (col("n").cast("double") * col("syy").cast("double")
                  - col("sy").cast("double") * col("sy").cast("double"))), 6)
              .as("acf"))
          .orderBy("lag")
      },
      Some("""WITH m AS (
        |  SELECT CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1
        |    AS BIGINT) AS m,
        |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |l AS (
        |  SELECT k.lag, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(a.c) AS BIGINT) AS sx, CAST(SUM(b.c) AS BIGINT) AS sy,
        |    SUM(CAST(a.c AS HUGEINT) * b.c) AS sxy,
        |    SUM(CAST(a.c AS HUGEINT) * a.c) AS sxx,
        |    SUM(CAST(b.c AS HUGEINT) * b.c) AS syy
        |  FROM (SELECT unnest([1, 2, 3]) AS lag) k
        |  JOIN m a ON true
        |  JOIN m b ON a.m = b.m + k.lag
        |  GROUP BY 1)
        |SELECT CAST(lag AS INT) AS lag, n,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * sy)
        |        / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |                - CAST(sx AS DOUBLE) * sx)
        |               * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |                  - CAST(sy AS DOUBLE) * sy)), 6) AS acf
        |FROM l ORDER BY lag""".stripMargin)),

    // Order-value trajectory per market segment — do customers spend more
    // as their order SEQUENCE advances? The per-customer order index is a
    // partitioned row_number; the OLS of cents on index pools exact
    // moments PER SEGMENT (never a float average of per-customer slopes —
    // that would sum floats across rows). Σxy stays Long-safe because the
    // index is bounded by orders-per-customer (≤ ~40).
    GraftQuery(
      "q267_order_trajectory",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("ck").orderBy("day", "ok")
        val seq0 = Tables(s, dir, "orders")
          .select(col("o_custkey").as("ck"), col("o_orderkey").as("ok"),
            expr("datediff(o_orderdate, DATE '1970-01-01')").cast("long").as("day"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("y"))
          .withColumn("x", row_number().over(w).cast("long"))
          .join(broadcast(Tables(s, dir, "customer")
            .select(col("c_custkey"), col("c_mktsegment").as("segment"))),
            col("ck") === col("c_custkey"))
        val m = seq0.groupBy(col("segment"))
          .agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
        val num = col("n").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")
        val den = col("n").cast("double") * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double")
        m.select(col("segment"), col("n").as("n_orders"),
            round(num / den / 100.0, 4).as("slope_dollars_per_step"))
          .orderBy("segment")
      },
      Some("""WITH o AS (
        |  SELECT o_custkey AS ck, o_orderkey AS ok,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS y
        |  FROM orders),
        |sq AS (
        |  SELECT ck, y,
        |    CAST(row_number() OVER (PARTITION BY ck ORDER BY day, ok) AS BIGINT)
        |      AS x
        |  FROM o),
        |j AS (
        |  SELECT c_mktsegment AS segment, x, y
        |  FROM sq JOIN customer ON ck = c_custkey),
        |m AS (
        |  SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    SUM(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM j GROUP BY 1)
        |SELECT segment, n AS n_orders,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * sy)
        |        / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        |        / 100.0, 4) AS slope_dollars_per_step
        |FROM m ORDER BY segment""".stripMargin)),

    // Brand preference lift per nation — (nation, brand) revenue share
    // over the brand's global share: where does a brand over-index? All
    // shares are ratios of exact cent sums (three window totals over the
    // ~625-cell frame); the top-20 ranks on the rounded lift with full
    // tiebreakers.
    GraftQuery(
      "q269_brand_preference_lift",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val cells = Tables(s, dir, "lineitem")
          .join(broadcast(Tables(s, dir, "part")
            .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .join(Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables(s, dir, "customer")
            .select(col("c_custkey"), col("c_nationkey"))),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), col("p_brand"))
          .agg(sum(expr("CAST(round(l_extendedprice * (1 - l_discount) * 100)"
            + " AS BIGINT)")).as("c"))
        cells
          .withColumn("ntot", sum(col("c")).over(Window.partitionBy("n_name")))
          .withColumn("btot", sum(col("c")).over(Window.partitionBy("p_brand")))
          .withColumn("g", sum(col("c")).over(Window.partitionBy()))
          .select(col("n_name"), col("p_brand"),
            (col("c").cast("double") / 100.0).as("revenue"),
            round((col("c").cast("double") / col("ntot").cast("double"))
              / (col("btot").cast("double") / col("g").cast("double")), 4)
              .as("lift"))
          .orderBy(col("lift").desc, col("n_name"), col("p_brand"))
          .limit(20)
      },
      Some("""WITH cells AS (
        |  SELECT n_name, p_brand,
        |    CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |      AS BIGINT)) AS BIGINT) AS c
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |w AS (
        |  SELECT *, SUM(c) OVER (PARTITION BY n_name) AS ntot,
        |    SUM(c) OVER (PARTITION BY p_brand) AS btot,
        |    SUM(c) OVER () AS g
        |  FROM cells)
        |SELECT n_name, p_brand, CAST(c AS DOUBLE) / 100.0 AS revenue,
        |  round((CAST(c AS DOUBLE) / CAST(ntot AS DOUBLE))
        |        / (CAST(btot AS DOUBLE) / CAST(g AS DOUBLE)), 4) AS lift
        |FROM w ORDER BY lift DESC, n_name, p_brand LIMIT 20""".stripMargin)),

    // Year-over-year same-month growth — each (year, month)'s revenue vs
    // the SAME month one year earlier (the seasonality-free growth line
    // q239's MoM cannot give). The lag is a month-key self-join on the
    // ~84-row monthly frame; exact cents until the growth division.
    GraftQuery(
      "q271_yoy_same_month",
      (s, dir) => {
        val monthly = Tables(s, dir, "orders")
          .groupBy(expr("year(o_orderdate)").cast("int").as("yr"),
            expr("month(o_orderdate)").cast("int").as("mo"))
          .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("c"))
        monthly.alias("cur")
          .join(monthly.select((col("yr") + 1).as("yr"), col("mo"),
            col("c").as("prev")).alias("pv"), Seq("yr", "mo"), "left")
          .select(col("yr"), col("mo"),
            (col("c").cast("double") / 100.0).as("revenue"),
            when(col("prev") > 0,
              round((col("c") - col("prev")).cast("double") * 100.0
                / col("prev").cast("double"), 4)).as("yoy_pct"))
          .orderBy("yr", "mo")
      },
      Some("""WITH m AS (
        |  SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |    CAST(month(o_orderdate) AS INT) AS mo,
        |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
        |  FROM orders GROUP BY 1, 2)
        |SELECT cur.yr, cur.mo, CAST(cur.c AS DOUBLE) / 100.0 AS revenue,
        |  CASE WHEN pv.c > 0 THEN
        |    round(CAST(cur.c - pv.c AS DOUBLE) * 100.0 / CAST(pv.c AS DOUBLE), 4)
        |  END AS yoy_pct
        |FROM m cur LEFT JOIN m pv ON cur.yr = pv.yr + 1 AND cur.mo = pv.mo
        |ORDER BY cur.yr, cur.mo""".stripMargin)),

    // Revenue waterfall 1997 → 1998 per brand — the FP&A decomposition:
    // Δrevenue = volume effect (Δqty at old avg price) + price/mix effect
    // (new qty at Δavg price). Per-brand qty and cent sums stay exact;
    // the two effects are final float expressions over those sums and
    // reconcile to the exact delta by construction.
    GraftQuery(
      "q272_revenue_waterfall",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
          .join(broadcast(Tables(s, dir, "part")
            .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .filter(expr("year(l_shipdate)").isin(1997, 1998))
          .groupBy(col("p_brand"), expr("year(l_shipdate)").cast("int").as("yr"))
          .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("q"),
            sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("c"))
        val a = li.filter(col("yr") === 1997)
          .select(col("p_brand"), col("q").as("q0"), col("c").as("c0"))
        val b = li.filter(col("yr") === 1998)
          .select(col("p_brand"), col("q").as("q1"), col("c").as("c1"))
        a.join(b, Seq("p_brand"))
          .filter(col("q0") > 0 && col("q1") > 0)
          .select(col("p_brand"),
            ((col("c1") - col("c0")).cast("double") / 100.0).as("delta_revenue"),
            round((col("q1") - col("q0")).cast("double")
              * (col("c0").cast("double") / col("q0").cast("double")) / 100.0, 2)
              .as("volume_effect"),
            round(col("q1").cast("double")
              * (col("c1").cast("double") / col("q1").cast("double")
                - col("c0").cast("double") / col("q0").cast("double")) / 100.0, 2)
              .as("price_mix_effect"))
          .orderBy("p_brand")
      },
      Some("""WITH li AS (
        |  SELECT p_brand, year(l_shipdate) AS yr,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
        |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS c
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE year(l_shipdate) IN (1997, 1998)
        |  GROUP BY 1, 2),
        |a AS (SELECT p_brand, q AS q0, c AS c0 FROM li WHERE yr = 1997),
        |b AS (SELECT p_brand, q AS q1, c AS c1 FROM li WHERE yr = 1998)
        |SELECT p_brand,
        |  CAST(c1 - c0 AS DOUBLE) / 100.0 AS delta_revenue,
        |  round(CAST(q1 - q0 AS DOUBLE)
        |        * (CAST(c0 AS DOUBLE) / CAST(q0 AS DOUBLE)) / 100.0, 2)
        |    AS volume_effect,
        |  round(CAST(q1 AS DOUBLE)
        |        * (CAST(c1 AS DOUBLE) / CAST(q1 AS DOUBLE)
        |           - CAST(c0 AS DOUBLE) / CAST(q0 AS DOUBLE)) / 100.0, 2)
        |    AS price_mix_effect
        |FROM a JOIN b USING (p_brand)
        |WHERE q0 > 0 AND q1 > 0
        |ORDER BY p_brand""".stripMargin)),

    // Customer–brand relationship churn 1997 → 1998 — per brand: retained
    // / new / lost distinct customer relationships between consecutive
    // years (the B2B account-management ledger). Two distinct pair frames,
    // one full outer join keyed (brand, customer), exact counts.
    GraftQuery(
      "q273_relationship_churn",
      (s, dir) => {
        def pairs(yr: Int) = Tables(s, dir, "lineitem")
          .join(broadcast(Tables(s, dir, "part")
            .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .join(Tables(s, dir, "orders")
            .filter(expr(s"year(o_orderdate) = $yr"))
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("p_brand"), col("o_custkey")).distinct()
        pairs(1997).withColumn("in0", lit(1L))
          .join(pairs(1998).withColumn("in1", lit(1L)),
            Seq("p_brand", "o_custkey"), "full")
          .groupBy(col("p_brand"))
          .agg(
            sum(when(col("in0").isNotNull && col("in1").isNotNull, 1L)
              .otherwise(0L)).as("retained"),
            sum(when(col("in0").isNull, 1L).otherwise(0L)).as("new_rel"),
            sum(when(col("in1").isNull, 1L).otherwise(0L)).as("lost"))
          .orderBy("p_brand")
      },
      Some("""WITH p97 AS (
        |  SELECT DISTINCT p_brand, o_custkey
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  WHERE year(o_orderdate) = 1997),
        |p98 AS (
        |  SELECT DISTINCT p_brand, o_custkey
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  WHERE year(o_orderdate) = 1998),
        |j AS (
        |  SELECT COALESCE(p97.p_brand, p98.p_brand) AS p_brand,
        |    CASE WHEN p97.p_brand IS NOT NULL THEN 1 END AS in0,
        |    CASE WHEN p98.p_brand IS NOT NULL THEN 1 END AS in1
        |  FROM p97 FULL JOIN p98
        |    ON p97.p_brand = p98.p_brand AND p97.o_custkey = p98.o_custkey)
        |SELECT p_brand,
        |  CAST(SUM(CASE WHEN in0 IS NOT NULL AND in1 IS NOT NULL THEN 1
        |           ELSE 0 END) AS BIGINT) AS retained,
        |  CAST(SUM(CASE WHEN in0 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS new_rel,
        |  CAST(SUM(CASE WHEN in1 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS lost
        |FROM j GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // Substitute-vs-complement brand pairs — brands the SAME customer
    // buys but (almost) never in the same basket read as substitutes;
    // basket co-occurrence (q122/q228) reads as complements. Customer-
    // level and basket-level co-occurrence counts come from the same
    // distinct frames; the substitution score is cust_co/(basket_co+1)
    // on exact Longs, top-15 with tiebreakers.
    GraftQuery(
      "q283_substitute_brands",
      (s, dir) => {
        val ob = Tables(s, dir, "lineitem")
          .join(broadcast(Tables(s, dir, "part")
            .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .join(Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_orderkey").as("ok"), col("o_custkey").as("ck"),
            col("p_brand").as("b"))
          .localCheckpoint()
        // basket-local expansion on BOTH grains: with the codegen pair
        // generator (nested posexplode+slice — round 15) the dense ~24-of-
        // 25-brand customer baskets no longer pay interpreted lambdas, so
        // the one-exchange expansion now beats the two-exchange codegen
        // self-join that round 14 measured faster (self-join 2.13 s vs
        // expansion 1.5 s warm at sf0.1)
        def coPairs(df: org.apache.spark.sql.DataFrame, key: String) = {
          val sets = df.groupBy(col(key)).agg(collect_set(col("b")).as("bs"))
          graft.operators.BasketPairs.explodePairsDistinct(sets, "bs")
            .groupBy(col("p1").as("b1"), col("p2").as("b2"))
            .agg(count(lit(1)).as("co"))
        }
        val custCo = coPairs(ob, "ck").withColumnRenamed("co", "cust_co")
        val basketCo = coPairs(ob, "ok").withColumnRenamed("co", "basket_co")
        custCo.join(basketCo, Seq("b1", "b2"), "left")
          .withColumn("basket_co", coalesce(col("basket_co"), lit(0L)))
          .withColumn("subst_score", round(col("cust_co").cast("double")
            / (col("basket_co") + 1).cast("double"), 4))
          .orderBy(col("subst_score").desc, col("b1"), col("b2"))
          .limit(15)
          .select(col("b1"), col("b2"), col("cust_co"), col("basket_co"),
            col("subst_score"))
      },
      Some("""WITH ob AS (
        |  SELECT o_orderkey AS ok, o_custkey AS ck, p_brand AS b
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey),
        |cu AS (SELECT DISTINCT ck, b FROM ob),
        |cc AS (
        |  SELECT a.b AS b1, c.b AS b2, CAST(COUNT(*) AS BIGINT) AS cust_co
        |  FROM cu a JOIN cu c ON a.ck = c.ck AND a.b < c.b GROUP BY 1, 2),
        |ba AS (SELECT DISTINCT ok, b FROM ob),
        |bc AS (
        |  SELECT a.b AS b1, c.b AS b2, CAST(COUNT(*) AS BIGINT) AS basket_co
        |  FROM ba a JOIN ba c ON a.ok = c.ok AND a.b < c.b GROUP BY 1, 2)
        |SELECT cc.b1, cc.b2, cc.cust_co,
        |  CAST(COALESCE(bc.basket_co, 0) AS BIGINT) AS basket_co,
        |  round(CAST(cc.cust_co AS DOUBLE)
        |        / CAST(COALESCE(bc.basket_co, 0) + 1 AS DOUBLE), 4)
        |    AS subst_score
        |FROM cc LEFT JOIN bc USING (b1, b2)
        |ORDER BY subst_score DESC, b1, b2 LIMIT 15""".stripMargin)))
}
