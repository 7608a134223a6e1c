package graft.queries

import graft.{GraftQuery, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 surface: sequence/behavior mining and training-set diagnostics —
  * per-user event paths, skyline (record-breaking) days, blocked fuzzy name
  * matching, distribution-drift between time halves, SCD2 interval building
  * from a change log, lexical-diversity profiling, moving z-score anomaly
  * detection, and contrastive hard-negative mining over embeddings.
  *
  * Determinism: every oracle-checked query here follows the engine-exact
  * playbook — integer arithmetic wherever a sum crosses rows (window/group
  * sums of BIGINT counts, never float accumulation), IEEE-exact single
  * divisions/square roots on top, and total-order ORDER BYs.
  *
  * Scale notes:
  *   - q107: two shuffles (user window, path rollup); the row_number cap
  *     bounds per-user state at 4 rows before the rollup.
  *   - q108: the skyline runs over the DAILY aggregate — O(span) rows — so
  *     the unpartitioned running-max window is over thousands of rows, not
  *     the fact table; the day rollup itself is one partial+final agg.
  *   - q109: the self-join runs on the DISTINCT name space (variant
  *     vocabulary), blocked by head noun — never |part|² rows.
  *   - q110/q112: single scan each; shares/indices are exact-integer counts
  *     divided once at the end.
  *   - q111: one user-window pass + one rollup — the standard
  *     gaps-and-islands SCD2 build, no self-join.
  *   - q113: daily rollup first, then a bounded 7-row window per type:
  *     state is O(types · 7), independent of event volume.
  *   - q114: filtered query side broadcast (8 vectors), probe side streams
  *     per partition, one shuffle ranks k per query.
  */
object Mining extends QueryPack {

  def queries: Seq[GraftQuery] = Seq(

    // Per-user ordered event paths (first 4 events), top-20 by frequency —
    // the "what do sessions look like" sweep behavior analytics starts with.
    GraftQuery(
      "q107_event_paths",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 4)
          .groupBy("user_id")
          .agg(array_join(
            expr("transform(array_sort(collect_list(struct(rn, event_type))), x -> x.event_type)"),
            ">").as("path"))
          .groupBy("path")
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("n_users").desc, col("path"))
          .limit(20)
      },
      Some("""WITH r AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 4 GROUP BY user_id)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_users
        |FROM p GROUP BY path ORDER BY n_users DESC, path LIMIT 20""".stripMargin)),

    // Skyline / record-breaking days: the Pareto frontier of (earlier day,
    // higher daily-max price) — a day survives iff its max price strictly
    // beats every earlier day's. One running-max window over the day rollup.
    GraftQuery(
      "q108_skyline_days",
      (s, dir) => {
        val d = Tables(s, dir, "orders")
          .select(datediff(col("o_orderdate"), lit("1990-01-01")).cast("long").as("day"),
            col("o_totalprice"))
          .groupBy("day")
          .agg(max(col("o_totalprice")).as("day_max"), count(lit(1)).as("n_orders"))
        val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
        d.withColumn("prior_max", max(col("day_max")).over(w))
          .filter(col("prior_max").isNull || col("day_max") > col("prior_max"))
          .select(col("day"), col("day_max"), col("n_orders"))
          .orderBy("day")
      },
      Some("""WITH d AS (
        |  SELECT date_diff('day', TIMESTAMP '1990-01-01', o_orderdate) AS day,
        |    max(o_totalprice) AS day_max, count(*) AS n_orders
        |  FROM orders GROUP BY 1),
        |s AS (
        |  SELECT day, day_max, n_orders,
        |    max(day_max) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max
        |  FROM d)
        |SELECT CAST(day AS BIGINT) AS day, day_max, CAST(n_orders AS BIGINT) AS n_orders
        |FROM s WHERE prior_max IS NULL OR day_max > prior_max ORDER BY day""".stripMargin)),

    // Fuzzy variant matching over the DISTINCT part-name vocabulary,
    // blocked by head noun: within a noun, name pairs within edit
    // distance 3 are spelling/qualifier variants — the record-linkage
    // blocking pattern (block key first, expensive distance after).
    GraftQuery(
      "q109_fuzzy_name_pairs",
      (s, dir) => {
        val names = Tables(s, dir, "part")
          .select(lower(col("p_name")).as("name")).distinct()
          .withColumn("noun", element_at(split(col("name"), " "), -1))
        val a = names.select(col("noun"), col("name").as("n1"))
        val b = names.select(col("noun"), col("name").as("n2"))
        a.join(b, "noun")
          .where(col("n1") < col("n2"))
          // free band prune BEFORE the quadratic work: dist <= 3 implies
          // |len(n1) - len(n2)| <= 3, and length() is O(1) where
          // levenshtein() is O(len²) — most intra-block pairs die here,
          // which is what keeps the blocked pair space survivable as the
          // catalog (and so each block) grows
          .where(abs(length(col("n1")) - length(col("n2"))) <= 3)
          .withColumn("dist", levenshtein(col("n1"), col("n2")).cast("long"))
          .where(col("dist") <= 3)
          .select(col("noun"), col("n1"), col("n2"), col("dist"))
          .orderBy("noun", "n1", "n2")
      },
      Some("""WITH names AS (
        |  SELECT DISTINCT lower(p_name) AS name FROM part),
        |t AS (
        |  SELECT name, string_split(name, ' ')[-1] AS noun FROM names)
        |SELECT a.noun AS noun, a.name AS n1, b.name AS n2,
        |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
        |FROM t a JOIN t b ON a.noun = b.noun
        |WHERE a.name < b.name
        |  AND abs(length(a.name) - length(b.name)) <= 3
        |  AND levenshtein(a.name, b.name) <= 3
        |ORDER BY noun, n1, n2""".stripMargin)),

    // Distribution drift between the first and second half of the time
    // range: per-type counts and share deltas, plus the per-type
    // total-variation contribution — all integer counts divided once, no
    // float accumulation (the engine-exact alternative to KL, which would
    // drag in cross-engine ln()).
    GraftQuery(
      "q110_event_mix_drift",
      (s, dir) => {
        val e = Tables(s, dir, "events")
          .select(col("event_type"), expr("ts div 1000").as("us"))
        val b = e.agg(expr("(min(us) + max(us)) div 2").as("mid"))
        val w = Window.partitionBy()
        e.crossJoin(broadcast(b))
          .groupBy("event_type")
          .agg(
            sum(when(col("us") < col("mid"), 1L).otherwise(0L)).as("n1"),
            sum(when(col("us") >= col("mid"), 1L).otherwise(0L)).as("n2"))
          .withColumn("t1", sum(col("n1")).over(w))
          .withColumn("t2", sum(col("n2")).over(w))
          .select(col("event_type"), col("n1"), col("n2"),
            round(col("n1") / col("t1"), 6).as("share1"),
            round(col("n2") / col("t2"), 6).as("share2"),
            round(abs(col("n1") / col("t1") - col("n2") / col("t2")), 6).as("drift"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (SELECT event_type, epoch_us(ts) AS us FROM events),
        |b AS (SELECT (min(us) + max(us)) // 2 AS mid FROM e),
        |h AS (
        |  SELECT event_type,
        |    SUM(CASE WHEN us < mid THEN 1 ELSE 0 END) AS n1,
        |    SUM(CASE WHEN us >= mid THEN 1 ELSE 0 END) AS n2
        |  FROM e CROSS JOIN b GROUP BY 1),
        |t AS (SELECT event_type, n1, n2, SUM(n1) OVER () AS t1, SUM(n2) OVER () AS t2 FROM h)
        |SELECT event_type, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |  round(CAST(n1 AS DOUBLE) / t1, 6) AS share1,
        |  round(CAST(n2 AS DOUBLE) / t2, 6) AS share2,
        |  round(abs(CAST(n1 AS DOUBLE) / t1 - CAST(n2 AS DOUBLE) / t2), 6) AS drift
        |FROM t ORDER BY event_type""".stripMargin)),

    // SCD2 interval build from a change log (gaps-and-islands): collapse
    // each user's consecutive same-type runs into (valid_from, valid_to)
    // rows, valid_to = next run's start (null while current) — the CDC→
    // dimension-table transform every warehouse load runs.
    GraftQuery(
      "q111_scd2_intervals",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        val runW = w.rowsBetween(Window.unboundedPreceding, 0)
        val iv = Tables(s, dir, "events")
          .select(col("user_id"), expr("ts div 1000").as("us"),
            col("event_id"), col("event_type"))
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .withColumn("chg",
            when(col("prev").isNull || col("prev") =!= col("event_type"), 1L).otherwise(0L))
          .withColumn("grp", sum(col("chg")).over(runW))
          .groupBy(col("user_id"), col("grp"))
          .agg(min(col("event_type")).as("event_type"),
            min(col("us")).as("valid_from"),
            count(lit(1)).as("n_events"))
        val w2 = Window.partitionBy("user_id").orderBy("valid_from")
        iv.withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
          .select(col("user_id"), col("event_type"), col("valid_from"),
            col("valid_to"), col("n_events"))
          .orderBy("user_id", "valid_from")
      },
      Some("""WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events),
        |m AS (
        |  SELECT user_id, us, event_id, event_type,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |           OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |g AS (
        |  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM m),
        |iv AS (
        |  SELECT user_id, grp, min(event_type) AS event_type,
        |    min(us) AS valid_from, count(*) AS n_events
        |  FROM g GROUP BY 1, 2)
        |SELECT user_id, event_type, CAST(valid_from AS BIGINT) AS valid_from,
        |  CAST(lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) AS BIGINT) AS valid_to,
        |  CAST(n_events AS BIGINT) AS n_events
        |FROM iv ORDER BY user_id, valid_from""".stripMargin)),

    // Lexical diversity per source: type-token ratio and Simpson diversity
    // index (1 - Σc²/n²) — concentration/diversity of the token
    // distribution without entropy's cross-engine ln(). Σc² is an exact
    // BIGINT sum, so both engines divide identical integers.
    GraftQuery(
      "q112_lexical_diversity",
      (s, dir) => {
        Tables.spread(Tables(s, dir, "documents"), "doc_id")
          .select(col("source"), explode(split(lower(col("text")), " ")).as("w"))
          .filter(col("w") =!= "")
          .groupBy("source", "w")
          .agg(count(lit(1)).as("c"))
          .groupBy("source")
          .agg(sum(col("c")).as("n_tokens"),
            count(lit(1)).as("n_types"),
            sum(col("c") * col("c")).as("s2"))
          .select(col("source"), col("n_tokens"), col("n_types"),
            round(col("n_types") / col("n_tokens"), 6).as("ttr"),
            round(lit(1.0) - col("s2") / (col("n_tokens") * col("n_tokens")), 6)
              .as("simpson"))
          .orderBy("source")
      },
      Some("""WITH tok AS (
        |  SELECT source, unnest(string_split(lower(text), ' ')) AS w FROM documents),
        |c AS (
        |  SELECT source, w, count(*) AS c FROM tok WHERE w <> '' GROUP BY 1, 2),
        |a AS (
        |  SELECT source, SUM(c) AS n_tokens, count(*) AS n_types, SUM(c * c) AS s2
        |  FROM c GROUP BY 1)
        |SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(n_types AS BIGINT) AS n_types,
        |  round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr,
        |  round(1.0 - CAST(s2 AS DOUBLE) / (CAST(n_tokens AS DOUBLE) * n_tokens), 6) AS simpson
        |FROM a ORDER BY source""".stripMargin)),

    // Moving z-score anomaly detection over daily per-type event counts:
    // mean/variance from the prior 7 observed days via exact integer window
    // sums (Σx, Σx² in BIGINT — no float accumulation order), flag |z| > 2.
    GraftQuery(
      "q113_moving_zscore",
      (s, dir) => {
        val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
        Tables(s, dir, "events")
          .select(col("event_type"), expr("ts div 86400000000000").as("day"))
          .groupBy("event_type", "day")
          .agg(count(lit(1)).as("n"))
          .withColumn("cnt", count(lit(1)).over(w))
          .withColumn("s1", sum(col("n")).over(w))
          .withColumn("s2", sum(col("n") * col("n")).over(w))
          .filter(col("cnt") === 7)
          .withColumn("mean", col("s1") / lit(7.0))
          .withColumn("vr", (col("s2") - col("s1") * col("s1") / lit(7.0)) / lit(6.0))
          .filter(col("vr") > 0)
          .withColumn("z", (col("n") - col("mean")) / sqrt(col("vr")))
          .filter(abs(col("z")) > 2.0)
          .select(col("event_type"), col("day"), col("n"), round(col("z"), 4).as("z"))
          .orderBy("event_type", "day")
      },
      Some("""WITH d AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, day, n,
        |    count(*) OVER w AS cnt, SUM(n) OVER w AS s1, SUM(n * n) OVER w AS s2
        |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        |z AS (
        |  SELECT event_type, day, n,
        |    (n - s1 / 7.0) / sqrt((s2 - s1 * s1 / 7.0) / 6.0) AS z,
        |    (s2 - s1 * s1 / 7.0) / 6.0 AS vr
        |  FROM m WHERE cnt = 7)
        |SELECT event_type, CAST(day AS BIGINT) AS day, CAST(n AS BIGINT) AS n,
        |  round(z, 4) AS z
        |FROM z WHERE vr > 0 AND abs(z) > 2.0 ORDER BY event_type, day""".stripMargin)),

    // Contrastive hard-negative mining: for each of the 8 anchor vectors,
    // the 3 most cosine-similar vectors with a DIFFERENT label — the
    // "embedding thinks they're alike, labels disagree" pairs a contrastive
    // trainer feeds as negatives.
    GraftQuery(
      "q114_hard_negatives",
      (s, dir) => {
        graft.operators.BruteForceCosine
          .hardNegatives(Tables(s, dir, "embeddings"), "vec_id", "embedding",
            "label", queryPred = col("vec_id") < 8, k = 3)
          .select(col("query_id"), col("qlabel"), col("neighbor_id"), col("nlabel"),
            round(col("sim"), 6).as("sim"), col("rnk").cast("long").as("rnk"))
          .orderBy("query_id", "rnk")
      },
      Some("""WITH e AS (
        |  SELECT vec_id, label, [CAST(x AS DOUBLE) FOR x IN embedding] AS emb FROM embeddings),
        |n AS (
        |  SELECT vec_id, label, emb,
        |    list_reduce([x * x FOR x IN emb], (a, b) -> a + b) AS norm2 FROM e),
        |q AS (SELECT vec_id AS query_id, label AS qlabel, emb AS qemb, norm2 AS qn
        |      FROM n WHERE vec_id < 8),
        |pairs AS (
        |  SELECT q.query_id, q.qlabel, n.vec_id AS neighbor_id, n.label AS nlabel,
        |    list_reduce([qemb[i] * emb[i] FOR i IN generate_series(1, len(emb))], (a, b) -> a + b)
        |      / (sqrt(qn) * sqrt(norm2)) AS sim
        |  FROM n, q WHERE n.vec_id <> q.query_id AND n.label <> q.qlabel),
        |r AS (
        |  SELECT query_id, qlabel, neighbor_id, nlabel, sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
        |  FROM pairs)
        |SELECT query_id, CAST(qlabel AS BIGINT) AS qlabel, neighbor_id,
        |  CAST(nlabel AS BIGINT) AS nlabel, round(sim, 6) AS sim, CAST(rnk AS BIGINT) AS rnk
        |FROM r WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin)),

    // SCD2 point-in-time lookup — q111's state intervals consumed the way a
    // warehouse consumes them: each PURCHASE resolves the behavioral state
    // (the run of non-purchase activity) that was valid at purchase time.
    // Intervals per user are contiguous and non-overlapping, so the lookup
    // is exactly a backward as-of join on valid_from (operators.AsOfJoin:
    // per-key window, one shuffle per side, no interval blow-up); purchases
    // before a user's first non-purchase event report state 'none'.
    GraftQuery(
      "q156_scd2_pointintime",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
          .select(col("user_id"), expr("ts div 1000").as("us"),
            col("event_id"), col("event_type"))
        val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        val runW = w.rowsBetween(Window.unboundedPreceding, 0)
        val iv = ev.filter(col("event_type") =!= "purchase")
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .withColumn("chg",
            when(col("prev").isNull || col("prev") =!= col("event_type"), 1L).otherwise(0L))
          .withColumn("grp", sum(col("chg")).over(runW))
          .groupBy(col("user_id"), col("grp"))
          .agg(min(col("event_type")).as("state"), min(col("us")).as("valid_from"))
        val buys = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
            col("us").as("t_us"))
        graft.operators.AsOfJoin(
          left = buys, leftKey = col("p_user"), leftTime = col("t_us"),
          right = iv, rightKey = col("user_id"), rightTime = col("valid_from"),
          tiebreak = col("grp"), payload = Seq("state"))
          .groupBy(coalesce(col("state"), lit("none")).as("state_at_purchase"))
          .agg(count(lit(1)).as("n_purchases"),
            countDistinct(col("p_user")).as("n_users"))
          .orderBy("state_at_purchase")
      },
      Some("""WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events),
        |m AS (
        |  SELECT user_id, us, event_id, event_type,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |           OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM e WHERE event_type <> 'purchase'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |g AS (
        |  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM m),
        |iv AS (
        |  SELECT user_id, grp, min(event_type) AS state, min(us) AS valid_from
        |  FROM g GROUP BY 1, 2),
        |b AS (
        |  SELECT event_id AS p_id, user_id AS p_user, us AS t_us
        |  FROM e WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT b.p_user, l.state
        |  FROM b LEFT JOIN LATERAL (
        |    SELECT state FROM iv
        |    WHERE iv.user_id = b.p_user AND iv.valid_from <= b.t_us
        |    ORDER BY iv.valid_from DESC, iv.grp DESC LIMIT 1
        |  ) l ON true)
        |SELECT COALESCE(state, 'none') AS state_at_purchase,
        |  CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |  CAST(COUNT(DISTINCT p_user) AS BIGINT) AS n_users
        |FROM j GROUP BY 1 ORDER BY state_at_purchase""".stripMargin)),

    // Basket-size distribution — lines-per-order histogram with each size
    // class's share of orders AND of line volume: the fan-out profile that
    // sizes the orders⋈lineitem join (skew lives here). Exact integers,
    // two rounded shares.
    GraftQuery(
      "q203_basket_histogram",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val sizes = Tables(s, dir, "lineitem")
          .groupBy(col("l_orderkey")).agg(count(lit(1)).as("sz"))
        sizes.groupBy(col("sz"))
          .agg(count(lit(1)).as("n_orders"))
          .withColumn("total_orders", sum(col("n_orders")).over(Window.partitionBy()))
          .withColumn("total_lines",
            sum(col("sz") * col("n_orders")).over(Window.partitionBy()))
          .select(col("sz"), col("n_orders"),
            (col("sz") * col("n_orders")).as("n_lines"),
            round(col("n_orders").cast("double") / col("total_orders"), 6)
              .as("order_share"),
            round((col("sz") * col("n_orders")).cast("double") / col("total_lines"), 6)
              .as("line_share"))
          .orderBy("sz")
      },
      Some("""WITH s AS (
        |  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS sz
        |  FROM lineitem GROUP BY 1),
        |h AS (SELECT sz, CAST(COUNT(*) AS BIGINT) AS n_orders FROM s GROUP BY 1)
        |SELECT sz, n_orders, CAST(sz * n_orders AS BIGINT) AS n_lines,
        |  round(CAST(n_orders AS DOUBLE) / SUM(n_orders) OVER (), 6) AS order_share,
        |  round(CAST(sz * n_orders AS DOUBLE) / SUM(sz * n_orders) OVER (), 6)
        |    AS line_share
        |FROM h ORDER BY sz""".stripMargin)),

    // Return-rate deviations — per-brand return share vs the global rate,
    // ranked by absolute deviation: the defect-attribution starting point.
    // Counts exact; shares and deltas are two final rounded divisions.
    GraftQuery(
      "q204_return_deviations",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val li = Tables(s, dir, "lineitem")
          .join(broadcast(Tables(s, dir, "part")
            .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_brand"),
            when(col("l_returnflag") === "R", 1L).otherwise(0L).as("ret"))
        val byBrand = li.groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_lines"), sum(col("ret")).as("n_returned"))
        byBrand
          .withColumn("g_lines", sum(col("n_lines")).over(Window.partitionBy()))
          .withColumn("g_returned", sum(col("n_returned")).over(Window.partitionBy()))
          .select(col("p_brand"), col("n_lines"), col("n_returned"),
            round(col("n_returned").cast("double") / col("n_lines"), 6).as("rate"),
            round(col("n_returned").cast("double") / col("n_lines")
              - col("g_returned").cast("double") / col("g_lines"), 6).as("delta"))
          .orderBy(abs(col("delta")).desc, col("p_brand"))
          .limit(10)
      },
      Some("""WITH b AS (
        |  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_returned
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1)
        |SELECT p_brand, n_lines, n_returned,
        |  round(CAST(n_returned AS DOUBLE) / n_lines, 6) AS rate,
        |  round(CAST(n_returned AS DOUBLE) / n_lines
        |        - CAST(SUM(n_returned) OVER () AS DOUBLE) / SUM(n_lines) OVER (), 6)
        |    AS delta
        |FROM b
        |ORDER BY abs(round(CAST(n_returned AS DOUBLE) / n_lines
        |        - CAST(SUM(n_returned) OVER () AS DOUBLE) / SUM(n_lines) OVER (), 6))
        |  DESC, p_brand
        |LIMIT 10""".stripMargin)),

    // Customer value-decile mobility — the transition matrix between a
    // customer's early-half and late-half spend decile (NTILE over exact
    // cent totals): diagonal mass = stable base, off-diagonal = churn/
    // growth. The segmentation-drift analysis CRM teams run; customers
    // active in only one half are excluded by the inner join.
    GraftQuery(
      "q205_decile_mobility",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val o = Tables(s, dir, "orders")
          .select(col("o_custkey"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
            year(col("o_orderdate")).as("yr"))
        val mid = o.agg(expr("(min(yr) + max(yr)) div 2").as("mid_yr"))
        val marked = o.crossJoin(broadcast(mid))
          .withColumn("half", when(col("yr") <= col("mid_yr"), "early").otherwise("late"))
        val totals = marked.groupBy(col("half"), col("o_custkey"))
          .agg(sum(col("cents")).as("cents"))
          .withColumn("dec", ntile(5).over(
            Window.partitionBy("half").orderBy(col("cents").asc, col("o_custkey"))))
        val e = totals.filter(col("half") === "early")
          .select(col("o_custkey"), col("dec").cast("long").as("dec_early"))
        val l = totals.filter(col("half") === "late")
          .select(col("o_custkey"), col("dec").cast("long").as("dec_late"))
        e.join(l, Seq("o_custkey"))
          .groupBy(col("dec_early"), col("dec_late"))
          .agg(count(lit(1)).as("n_customers"))
          .orderBy("dec_early", "dec_late")
      },
      Some("""WITH o AS (
        |  SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    year(o_orderdate) AS yr
        |  FROM orders),
        |m AS (SELECT (min(yr) + max(yr)) // 2 AS mid_yr FROM o),
        |t AS (
        |  SELECT CASE WHEN yr <= (SELECT mid_yr FROM m) THEN 'early' ELSE 'late' END
        |      AS half,
        |    o_custkey, SUM(cents) AS cents
        |  FROM o GROUP BY 1, 2),
        |d AS (
        |  SELECT half, o_custkey,
        |    CAST(ntile(5) OVER (PARTITION BY half ORDER BY cents, o_custkey)
        |      AS BIGINT) AS dec
        |  FROM t)
        |SELECT e.dec AS dec_early, l.dec AS dec_late,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM (SELECT o_custkey, dec FROM d WHERE half = 'early') e
        |JOIN (SELECT o_custkey, dec FROM d WHERE half = 'late') l USING (o_custkey)
        |GROUP BY 1, 2 ORDER BY dec_early, dec_late""".stripMargin)),

    // Single-sourcing audit — supply-chain resilience: per part-count of
    // distinct suppliers, rolled into a sourcing histogram with the
    // single-source fraction. All exact; the multi-sourcing policy gate.
    GraftQuery(
      "q206_single_sourcing",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val perPart = Tables(s, dir, "lineitem")
          .groupBy(col("l_partkey"))
          .agg(countDistinct(col("l_suppkey")).as("n_suppliers"))
        perPart.groupBy(col("n_suppliers"))
          .agg(count(lit(1)).as("n_parts"))
          .withColumn("total", sum(col("n_parts")).over(Window.partitionBy()))
          .select(col("n_suppliers"), col("n_parts"),
            round(col("n_parts").cast("double") / col("total"), 6).as("part_frac"))
          .orderBy("n_suppliers")
      },
      Some("""WITH p AS (
        |  SELECT l_partkey, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
        |  FROM lineitem GROUP BY 1),
        |h AS (SELECT n_suppliers, CAST(COUNT(*) AS BIGINT) AS n_parts
        |      FROM p GROUP BY 1)
        |SELECT n_suppliers, n_parts,
        |  round(CAST(n_parts AS DOUBLE) / SUM(n_parts) OVER (), 6) AS part_frac
        |FROM h ORDER BY n_suppliers""".stripMargin)),

    // Intra-part price dispersion — same part sold at different unit
    // prices: per-part min/max/spread in exact cents (unit price =
    // extendedprice/quantity at cent precision via integer cross-check is
    // NOT exact, so dispersion is measured on extendedprice per unit
    // quantity bucket instead: lines with quantity 1..5 only, where the
    // per-unit cent value divides exactly). Top-10 by spread.
    GraftQuery(
      "q207_price_dispersion",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
          .filter(col("l_quantity") <= 5)
          .select(col("l_partkey"),
            expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("ext_c"),
            expr("CAST(round(l_quantity * 100) AS BIGINT)").as("qty_c"))
          .filter(expr("(ext_c * 100) % qty_c = 0"))
          .withColumn("unit_c", expr("(ext_c * 100) div qty_c"))
        li.groupBy(col("l_partkey"))
          .agg(count(lit(1)).as("n_lines"),
            min(col("unit_c")).as("min_unit_c"),
            max(col("unit_c")).as("max_unit_c"))
          .filter(col("n_lines") >= 2)
          .select(col("l_partkey"), col("n_lines"),
            (col("min_unit_c").cast("double") / 100.0).as("min_unit"),
            (col("max_unit_c").cast("double") / 100.0).as("max_unit"),
            ((col("max_unit_c") - col("min_unit_c")).cast("double") / 100.0)
              .as("spread"))
          .orderBy(col("spread").desc, col("l_partkey"))
          .limit(10)
      },
      Some("""WITH li AS (
        |  SELECT l_partkey,
        |    (CAST(round(l_extendedprice * 100) AS BIGINT) * 100)
        |      // CAST(round(l_quantity * 100) AS BIGINT) AS unit_c
        |  FROM lineitem
        |  WHERE l_quantity <= 5
        |    AND (CAST(round(l_extendedprice * 100) AS BIGINT) * 100)
        |        % CAST(round(l_quantity * 100) AS BIGINT) = 0),
        |g AS (
        |  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |    MIN(unit_c) AS min_unit_c, MAX(unit_c) AS max_unit_c
        |  FROM li GROUP BY 1 HAVING COUNT(*) >= 2)
        |SELECT l_partkey, n_lines,
        |  CAST(min_unit_c AS DOUBLE) / 100.0 AS min_unit,
        |  CAST(max_unit_c AS DOUBLE) / 100.0 AS max_unit,
        |  CAST(max_unit_c - min_unit_c AS DOUBLE) / 100.0 AS spread
        |FROM g ORDER BY spread DESC, l_partkey LIMIT 10""".stripMargin)),

    // Jaro–Winkler fuzzy pairs through the native codegen expression
    // [[graft.functions.expressions.JaroWinkler]] — blocked self-join on
    // (brand, size) so candidates are bounded per bucket (the same blocking
    // discipline as q109's Levenshtein pairs), similarity evaluated inside
    // whole-stage codegen, top-20 via TakeOrderedAndProject. The oracle is
    // DuckDB's own jaro_winkler_similarity — the expression's semantics
    // (boost threshold 0.7, prefix cap 4, empty → 0) are pinned both here
    // and in JaroWinklerSpec.
    GraftQuery(
      "q225_jaro_winkler_pairs",
      (s, dir) => {
        graft.functions.expressions.JaroWinkler.register(s)
        val p = Tables(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"), col("p_size"), col("p_name"))
        val a = p.select(col("p_brand").as("ab"), col("p_size").as("as_"),
          col("p_partkey").as("k1"), col("p_name").as("n1"))
        val b = p.select(col("p_brand").as("bb"), col("p_size").as("bs"),
          col("p_partkey").as("k2"), col("p_name").as("n2"))
        a.join(b, col("ab") === col("bb") && col("as_") === col("bs")
            && col("k1") < col("k2"))
          .select(col("k1"), col("k2"), col("n1"), col("n2"),
            round(expr("jaro_winkler(n1, n2)"), 6).as("jw"))
          .orderBy(col("jw").desc, col("k1").asc, col("k2").asc)
          .limit(20)
      },
      Some("""SELECT a.p_partkey AS k1, b.p_partkey AS k2,
        |  a.p_name AS n1, b.p_name AS n2,
        |  round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
        |  AND a.p_partkey < b.p_partkey
        |ORDER BY jw DESC, k1, k2 LIMIT 20""".stripMargin)))
}
