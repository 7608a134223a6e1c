package graft.queries

import graft.{GraftQuery, QueryPack, Tables}
import graft.functions.expressions.{CosineSimilarity, InterleaveBits}
import graft.operators.{BpeTrainer, ConnectedComponents, KMeans}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-4 training-data operators: n-gram LM quality scoring, importance
  * resampling, segment-level dedup, Bloom-prefiltered decontamination,
  * Z-order layout, k-means semantic clustering, incremental dedup against a
  * reference corpus, BPE tokenizer training, and SemDeDup-style semantic
  * dedup — the remaining shapes a 100 TB pretraining pipeline runs between
  * crawl and tokenizer.
  *
  * Scale notes (per query):
  *   - q91: the bigram LM table is vocab² — tiny next to the corpus — so the
  *     score join broadcasts it; the corpus is scanned twice (count pass +
  *     score pass), the inherent two-pass shape of corpus-LM scoring.
  *   - q92: pure per-row projection + one partial+final agg; the acceptance
  *     test u < w is exact binary arithmetic (u = k/4096, w = n/512, both
  *     dyadic), so the sample is reproducible on any engine.
  *   - q93: one shuffle on the segment digest; the row_number window carries
  *     digest groups (dup cardinality), never whole documents.
  *   - q94: the Bloom filter (built from the SMALL eval side, broadcast
  *     read-only) drops ~(1-fpp) of candidate grams executor-locally BEFORE
  *     the semi-join shuffle — the exact confirm join then kills the false
  *     positives, so the output is bit-identical to the un-filtered exact
  *     plan while the shuffle carries a few % of the grams.
  *   - q95: `interleave_bits` is a codegen'd Catalyst expression; bucketing
  *     by Z-value prefix is the multi-dimensional file-layout pass — each
  *     bucket covers one (custkey × day) tile, so filters on EITHER key
  *     prune most buckets at scan time.
  *   - q96/q98: see [[graft.operators.KMeans]] / [[graft.operators.BpeTrainer]].
  *   - q97: digests and 20-word windows shuffle once each; the reference
  *     side collapses to distinct digests before the semi-joins.
  */
object Training extends QueryPack {

  private val hexpos = graft.queries.hexDigitVal _

  def queries: Seq[GraftQuery] = Seq(

    // n-gram LM coverage scoring: train a corpus bigram table, score every
    // doc by the fraction of its bigram instances that are globally frequent
    // (count >= 30) — the CCNet-style "does this text look like the corpus"
    // quality gate, with integer-exact math instead of log-probs so the
    // oracle agrees bit-for-bit. Lowest-coverage docs (the outliers a
    // quality gate would cut) surface first.
    GraftQuery(
      "q91_ngram_lm_coverage",
      (s, dir) => {
        val w = Tables.spread(Tables(s, dir, "documents"), "doc_id")
          .select(col("doc_id"), col("source"), split(col("text"), " ").as("ws"))
          .filter(size(col("ws")) >= 2)
        val bg = w.select(col("doc_id"), col("source"), explode(expr(
          "transform(sequence(1, size(ws) - 1), i -> concat_ws(' ', ws[i-1], ws[i]))"))
          .as("bigram"))
        val counts = bg.groupBy("bigram").agg(count(lit(1)).as("c"))
        // NO broadcast hint: `counts` is a corpus-wide bigram vocabulary —
        // unbounded at scale (a 100 TB corpus's bigram table does not fit an
        // executor). AQE picks broadcast when the built side is actually
        // small; at scale this is a sort-merge join on the shuffle key the
        // aggregation already established.
        bg.join(counts, Seq("bigram"))
          .groupBy(col("doc_id"), col("source"))
          .agg(
            count(lit(1)).as("n_bigrams"),
            countDistinct(col("bigram")).as("n_distinct"),
            round(sum(when(col("c") >= 30, 1).otherwise(0)).cast("double")
              / count(lit(1)), 4).as("lm_coverage"))
          .orderBy(col("lm_coverage").asc, col("doc_id"))
          .limit(20)
      },
      Some("""WITH w AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (
        |  SELECT doc_id, source, UNNEST(list_transform(
        |    generate_series(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1])) AS bigram
        |  FROM w),
        |counts AS (SELECT bigram, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY 1)
        |SELECT bg.doc_id, bg.source,
        |  CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(count(DISTINCT bg.bigram) AS BIGINT) AS n_distinct,
        |  ROUND(CAST(SUM(CASE WHEN c.c >= 30 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 4) AS lm_coverage
        |FROM bg JOIN counts c USING (bigram)
        |GROUP BY 1, 2
        |ORDER BY lm_coverage ASC, doc_id ASC LIMIT 20""".stripMargin)),

    // Importance resampling (DSIR-shaped): accept each doc with probability
    // proportional to a quality weight, decided by a content-addressed
    // uniform draw — deterministic, so the resampled corpus is reproducible
    // and the oracle replays the identical draw. u = first-3-hex-digits/4096
    // and w = min(1, n_chars/512) are both dyadic rationals: the comparison
    // is exact on any IEEE engine.
    GraftQuery(
      "q92_importance_resampling",
      (s, dir) => {
        val h = md5(concat(lit("rs:"), col("doc_id").cast("string")))
        val u = (hexpos(substring(h, 1, 1)) * 256 +
          hexpos(substring(h, 2, 1)) * 16 +
          hexpos(substring(h, 3, 1))) / lit(4096.0)
        val wt = least(lit(1.0), col("n_chars") / lit(512.0))
        Tables(s, dir, "documents")
          .select(col("source"), u.as("u"), wt.as("w"))
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("u") < col("w"), 1).otherwise(0)).cast("long").as("n_kept"),
            round(sum(col("w").cast(DecimalType(18, 4))), 4).cast("double")
              .as("expected_kept"))
          .orderBy("source")
      },
      Some("""WITH d AS (
        |  SELECT source, n_chars,
        |    ((instr('0123456789abcdef', substr(md5('rs:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 256 +
        |     (instr('0123456789abcdef', substr(md5('rs:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 16 +
        |     (instr('0123456789abcdef', substr(md5('rs:' || CAST(doc_id AS VARCHAR)), 3, 1)) - 1)) / 4096.0 AS u,
        |    LEAST(1.0, n_chars / 512.0) AS w
        |  FROM documents)
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN u < w THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(ROUND(SUM(CAST(w AS DECIMAL(18,4))), 4) AS DOUBLE) AS expected_kept
        |FROM d GROUP BY source ORDER BY source""".stripMargin)),

    // Segment-level exact dedup (the windowed approximation of suffix-array
    // substring dedup): cut each doc into consecutive 10-word segments,
    // dedup segments corpus-wide by digest keeping the first (doc_id,
    // seg_idx) occurrence, report per-source duplication. At 100 TB this is
    // one digest shuffle — the segment table is ~n_words/10 rows.
    GraftQuery(
      "q93_segment_dedup",
      (s, dir) => {
        val segs = Tables.spread(Tables(s, dir, "documents"), "doc_id")
          .select(col("doc_id"), col("source"), split(col("text"), " ").as("ws"))
          .select(col("doc_id"), col("source"), explode(expr(
            """filter(
              |  transform(sequence(0, (size(ws) - 1) div 10),
              |    k -> struct(k AS seg_idx, slice(ws, k * 10 + 1, 10) AS seg)),
              |  p -> size(p.seg) >= 5)""".stripMargin)).as("p"))
          .select(col("doc_id"), col("source"), col("p.seg_idx").as("seg_idx"),
            md5(concat_ws(" ", col("p.seg"))).as("dig"))
        val rn = row_number().over(
          Window.partitionBy(col("dig")).orderBy(col("doc_id"), col("seg_idx")))
        segs.withColumn("rn", rn)
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_segments"),
            sum(when(col("rn") > 1, 1).otherwise(0)).cast("long").as("n_dup_segments"),
            round(sum(when(col("rn") > 1, 1).otherwise(0)).cast("double")
              / count(lit(1)), 4).as("dup_frac"))
          .orderBy("source")
      },
      Some("""WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
        |seg AS (
        |  SELECT doc_id, source, UNNEST([
        |    struct_pack(seg_idx := k, seg := array_to_string(ws[k*10+1:k*10+10], ' '))
        |    FOR k IN generate_series(0, CAST(floor((len(ws)-1)/10.0) AS INT))
        |    IF len(ws[k*10+1:k*10+10]) >= 5]) AS p
        |  FROM w),
        |ranked AS (
        |  SELECT source,
        |    row_number() OVER (PARTITION BY md5(p.seg) ORDER BY doc_id, p.seg_idx) AS rn
        |  FROM seg)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_segments,
        |  CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_segments,
        |  ROUND(CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS dup_frac
        |FROM ranked GROUP BY source ORDER BY source""".stripMargin)),

    // Bloom-prefiltered decontamination: same exact semantics as a plain
    // 4-gram semi-join against the eval set (the oracle IS the plain exact
    // SQL), but the Spark plan first drops non-candidate grams against a
    // broadcast Bloom filter of the eval grams — the 100 TB pattern where
    // the shuffle would otherwise carry every gram in the corpus. The exact
    // confirm join eliminates Bloom false positives, so the prefilter is
    // invisible in the result (pinned in TrainingOpsSpec).
    GraftQuery(
      "q94_bloom_decontaminate",
      (s, dir) => {
        val g = Tables.spread(Tables(s, dir, "documents"), "doc_id")
          .select(col("doc_id"), col("source"), split(col("text"), " ").as("ws"))
          .filter(size(col("ws")) >= 4)
          .select(col("doc_id"), col("source"), explode(array_distinct(expr(
            "transform(sequence(0, size(ws) - 4), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3]))")))
            .as("gram"))
        // the eval-gram side feeds THREE consumers (cardinality count, Bloom
        // build, exact confirm join) — persist it once instead of exploding
        // the eval partition three times, then release after eagerly
        // materializing the 20-row result (the PrefixFilterJoin discipline)
        val evalGrams = g.filter(col("doc_id") % 10 === 0).select("gram").distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // size the filter from the actual eval cardinality — a hard-coded
          // capacity saturates past it and the prefilter silently stops
          // filtering (output stays exact, the shuffle saving vanishes)
          val nEval = evalGrams.count()
          val bloom = evalGrams.stat.bloomFilter("gram", math.max(nEval, 1000L), 0.03)
          val bc = s.sparkContext.broadcast(bloom)
          val mightContain = udf((gram: String) => gram != null && bc.value.mightContainString(gram))
          // materialize the 20-row result while evalGrams is still cached;
          // the local relation keeps no cache entry or lineage alive
          materializeSmall(g.filter(col("doc_id") % 10 =!= 0)
            .filter(mightContain(col("gram")))
            .join(evalGrams, Seq("gram"), "left_semi")
            .groupBy(col("doc_id"), col("source"))
            .agg(count(lit(1)).as("shared"))
            .orderBy(col("shared").desc, col("doc_id"))
            .limit(20))
        } finally evalGrams.unpersist()
      },
      Some("""WITH t AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
        |  WHERE len(string_split(text, ' ')) >= 4),
        |g AS (
        |  SELECT doc_id, source, unnest(list_distinct(
        |    [list_aggregate(ws[i:i+3], 'string_agg', ' ') FOR i IN generate_series(1, len(ws)-3)])) AS gram
        |  FROM t),
        |eval_g AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0),
        |hits AS (
        |  SELECT g.doc_id, g.source, COUNT(*) AS shared
        |  FROM g JOIN eval_g USING (gram) WHERE g.doc_id % 10 <> 0
        |  GROUP BY 1, 2)
        |SELECT doc_id, source, CAST(shared AS BIGINT) AS shared
        |FROM hits ORDER BY shared DESC, doc_id LIMIT 20""".stripMargin)),

    // Z-order data layout: Morton-interleave (custkey, order-day) and bucket
    // by Z-prefix — each bucket is one 1024×1024 tile of the key space
    // (min/max spans in the output prove the locality), which is what makes
    // min/max zone-map pruning work for filters on either dimension.
    GraftQuery(
      "q95_zorder_layout",
      (s, dir) => {
        InterleaveBits.register(s)
        // pmod keeps yk in [0, 4096) even for dates before the epoch anchor —
        // a plain % would go negative and Morton 16 low two's-complement bits
        // while the oracle interleaves only bits 0-11
        Tables(s, dir, "orders")
          .select(
            pmod(col("o_custkey"), lit(4096)).as("xk"),
            pmod(datediff(col("o_orderdate"), lit("1995-01-01")), lit(4096))
              .cast("long").as("yk"))
          .withColumn("zval", InterleaveBits.interleaveBits(col("xk"), col("yk")))
          .withColumn("zbucket", shiftright(col("zval"), 20))
          .groupBy("zbucket")
          .agg(
            count(lit(1)).as("n"),
            min(col("xk")).as("min_ck"), max(col("xk")).as("max_ck"),
            min(col("yk")).as("min_day"), max(col("yk")).as("max_day"))
          .orderBy("zbucket")
      },
      Some {
        val terms = (0 until 12).flatMap { i =>
          Seq(s"((xk >> $i) & 1) * ${1L << (2 * i)}",
            s"((yk >> $i) & 1) * ${1L << (2 * i + 1)}")
        }.mkString(" + ")
        s"""WITH d AS (
          |  SELECT ((o_custkey % 4096) + 4096) % 4096 AS xk,
          |    ((date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) % 4096) + 4096) % 4096 AS yk
          |  FROM orders),
          |z AS (SELECT xk, yk, CAST($terms AS BIGINT) >> 20 AS zbucket FROM d)
          |SELECT zbucket, CAST(count(*) AS BIGINT) AS n,
          |  CAST(min(xk) AS BIGINT) AS min_ck, CAST(max(xk) AS BIGINT) AS max_ck,
          |  CAST(min(yk) AS BIGINT) AS min_day, CAST(max(yk) AS BIGINT) AS max_day
          |FROM z GROUP BY zbucket ORDER BY zbucket""".stripMargin
      }),

    // Semantic clustering: deterministic Lloyd's k-means over the embedding
    // table (SemDeDup/topic-balance primitive). Rows-only by design (the
    // iterative fixpoint is not ANSI-expressible); determinism, inertia
    // monotonicity, and agreement with a naive reference are pinned in
    // KMeansSpec.
    GraftQuery(
      "q96_kmeans_clusters",
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        val model = KMeans.fit(emb, "vec_id", "embedding", k = 8, iters = 5)
        KMeans.assign(emb, "vec_id", "embedding", model)
          .groupBy("cluster")
          .agg(
            count(lit(1)).as("n_points"),
            round(sum(col("sqdist").cast(DecimalType(30, 10))), 4).cast("double")
              .as("cluster_inertia"))
          .orderBy("cluster")
          .select(col("cluster").cast("long").as("cluster"),
            col("n_points"), col("cluster_inertia"))
      },
      Some(kmeansReplayCtes(k = 8, iters = 5, seed = 42L) + """
        |SELECT CAST(cluster AS BIGINT) AS cluster,
        |  CAST(COUNT(*) AS BIGINT) AS n_points,
        |  CAST(ROUND(SUM(CAST(CAST(d AS VARCHAR) AS DECIMAL(30,10))), 4)
        |    AS DOUBLE) AS cluster_inertia
        |FROM fa GROUP BY cluster ORDER BY cluster""".stripMargin)),

    // Incremental dedup of a NEW batch (sources src10..src19) against the
    // existing REFERENCE corpus (src0..src9): prefix-fingerprint exact dup
    // + 20-word-window overlap — the nightly-crawl-vs-corpus shape where
    // only the new partition is rescanned.
    GraftQuery(
      "q97_incremental_dedup",
      (s, dir) => {
        val docs = Tables.spread(Tables(s, dir, "documents"), "doc_id")
          .select(col("doc_id"), col("source"), split(col("text"), " ").as("ws"))
        val isRef = length(col("source")) === 4
        val isNew = length(col("source")) === 5
        // the fingerprint frame is tiny (one row per doc) but its split()
        // rides every consumer — materialize it once; three consumers below
        val pref = docs.select(col("doc_id"), col("source"),
          md5(concat_ws(" ", slice(col("ws"), 1, 10))).as("pdig"))
          .localCheckpoint()
        val wins = docs.filter(size(col("ws")) >= 20)
          .select(col("doc_id"), col("source"), explode(array_distinct(expr(
            """transform(sequence(0, size(ws) - 20),
              |  i -> concat_ws(' ', slice(ws, i + 1, 20)))""".stripMargin)))
            .as("win"))
        // ref-side-distinct + semi-join evaluated the corpus-scale window
        // explode TWICE (once per side) behind two shuffles on `win`; a
        // single group-tag pass — does this window value occur in the
        // reference? — needs ONE explode and ONE shuffle. Same hot-key
        // profile as the join (both key on `win`), half the passes.
        def refTagged(df: org.apache.spark.sql.DataFrame, key: String) = {
          val w = org.apache.spark.sql.expressions.Window.partitionBy(col(key))
          df.withColumn("has_ref", max(when(isRef, 1).otherwise(0)).over(w))
            .filter(isNew && col("has_ref") === 1)
        }
        val exactIds = refTagged(pref, "pdig")
          .select("doc_id").distinct().withColumn("is_pd", lit(1))
        val winIds = refTagged(wins, "win")
          .select("doc_id").distinct().withColumn("is_w", lit(1))
        pref.filter(isNew)
          .join(exactIds, Seq("doc_id"), "left")
          .join(winIds, Seq("doc_id"), "left")
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_new"),
            sum(when(col("is_pd").isNotNull, 1).otherwise(0)).cast("long").as("prefix_dup"),
            sum(when(col("is_w").isNotNull, 1).otherwise(0)).cast("long").as("window_overlap"))
          .orderBy("source")
      },
      Some("""WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
        |g AS (
        |  SELECT doc_id, source, UNNEST(list_distinct(
        |    [list_aggregate(ws[i:i+19], 'string_agg', ' ') FOR i IN generate_series(1, len(ws)-19)])) AS win
        |  FROM w WHERE len(ws) >= 20),
        |p AS (SELECT doc_id, source, md5(array_to_string(ws[1:10], ' ')) AS pdig FROM w),
        |refp AS (SELECT DISTINCT pdig FROM p WHERE len(source) = 4),
        |refw AS (SELECT DISTINCT win FROM g WHERE len(source) = 4),
        |newd AS (SELECT doc_id, source, pdig FROM p WHERE len(source) = 5),
        |exact AS (SELECT DISTINCT n.doc_id FROM newd n JOIN refp r ON n.pdig = r.pdig),
        |contam AS (SELECT DISTINCT g.doc_id FROM g JOIN refw USING (win) WHERE len(g.source) = 5)
        |SELECT n.source,
        |  CAST(count(*) AS BIGINT) AS n_new,
        |  CAST(SUM(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS prefix_dup,
        |  CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS window_overlap
        |FROM newd n LEFT JOIN exact e ON n.doc_id = e.doc_id
        |LEFT JOIN contam c ON n.doc_id = c.doc_id
        |GROUP BY n.source ORDER BY n.source""".stripMargin)),

    // SemDeDup-shaped semantic dedup: k-means shards the embedding space,
    // near-dup cosine pairs are found WITHIN clusters only (the join key is
    // the cluster id, so the all-pairs blowup is bounded by cluster size —
    // the published trick that makes embedding dedup tractable at corpus
    // scale), connected components pick min-id representatives. Rows-only by
    // design (iterative k-means + fixpoint CC); the "every dropped row has a
    // kept near-dup" guarantee is pinned in TrainingOpsSpec.
    GraftQuery(
      "q99_semantic_dedup",
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        val model = KMeans.fit(emb, "vec_id", "embedding", k = 8, iters = 3)
        // (id, cluster, vec) feeds both sides of the within-cluster pair join
        // AND the final rollup — persist once instead of re-running the
        // assignment projection + embedding scan three times, release after
        // the k-row result is materialized
        val a = KMeans.assign(emb, "vec_id", "embedding", model)
          .select(col("id"), col("cluster"))
          .join(emb.select(col("vec_id").cast("long").as("id"),
            col("embedding").cast("array<double>").as("vec")), "id")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val x = a.select(col("cluster"), col("id").as("id1"), col("vec").as("v1"))
          val y = a.select(col("cluster"), col("id").as("id2"), col("vec").as("v2"))
          val pairs = x.join(y, "cluster")
            .where(col("id1") < col("id2"))
            .where(CosineSimilarity.cosineSim(col("v1"), col("v2")) >= 0.3)
            .select(col("id1"), col("id2"))
          val comp = ConnectedComponents.run(pairs, maxIter = 25, reliable = Some(false))
            .toDF("id", "component")
          // materialize the k-row rollup while `a` is still cached; the
          // local relation keeps no cache entry or lineage alive
          materializeSmall(a.select(col("id"), col("cluster")).join(comp, Seq("id"), "left")
            .select(col("cluster"),
              // isolated nodes are their own component ⇒ kept
              when(col("component").isNull.or(col("component") === col("id")), 1)
                .otherwise(0).as("kept"))
            .groupBy("cluster")
            .agg(count(lit(1)).as("n_points"),
              sum(col("kept")).cast("long").as("n_kept"),
              (count(lit(1)) - sum(col("kept"))).cast("long").as("n_dropped"))
            .orderBy("cluster")
            .select(col("cluster").cast("long").as("cluster"),
              col("n_points"), col("n_kept"), col("n_dropped")))
        } finally a.unpersist()
      },
      // the full SemDeDup chain replays: the k-means CTEs above, the
      // within-cluster cosine pairs (q42's index-ordered dot/norm folds),
      // the min-label components as a recursive closure (q69's pattern),
      // and the kept rule (isolated or component representative)
      Some("WITH RECURSIVE " + kmeansReplayCtes(k = 8, iters = 3, seed = 42L)
        .stripPrefix("WITH ") + """,
        |pairs AS MATERIALIZED (
        |  SELECT x.id AS id1, y.id AS id2
        |  FROM fa x JOIN fa y ON x.cluster = y.cluster AND x.id < y.id
        |  WHERE list_reduce([x.vec[i] * y.vec[i]
        |      FOR i IN generate_series(1, len(x.vec))], (a, b) -> a + b)
        |    / (sqrt(list_reduce([e * e FOR e IN x.vec], (a, b) -> a + b))
        |     * sqrt(list_reduce([e * e FOR e IN y.vec], (a, b) -> a + b)))
        |    >= 0.3),
        |edges AS (
        |  SELECT id1 AS a, id2 AS b FROM pairs
        |  UNION SELECT id2, id1 FROM pairs),
        |reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |comp AS (
        |  SELECT a AS id, least(a, MIN(b)) AS component
        |  FROM reach GROUP BY a)
        |SELECT CAST(f.cluster AS BIGINT) AS cluster,
        |  CAST(COUNT(*) AS BIGINT) AS n_points,
        |  CAST(SUM(CASE WHEN c.component IS NULL OR c.component = f.id
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN c.component IS NULL OR c.component = f.id
        |    THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
        |FROM fa f LEFT JOIN comp c ON c.id = f.id
        |GROUP BY f.cluster ORDER BY cluster""".stripMargin)),

    // BPE tokenizer training: 12 merges over the corpus word counts.
    // Oracle-checked: the FIXED merge count unrolls into 12 materialized
    // DuckDB CTE blocks (see bpeReplayCtes) that replay the argmax loop
    // bit-for-bit; the merge sequence is additionally pinned against a
    // hand-computed corpus in BpeTrainerSpec.
    GraftQuery(
      "q98_bpe_train",
      (s, dir) => {
        val wc = BpeTrainer.wordCounts(
          Tables.spread(Tables(s, dir, "documents"), "doc_id"), "text")
        val merges = BpeTrainer.train(wc, "word", "weight", nMerges = 12)
        BpeTrainer.mergesDf(s, merges)
          .select(col("rank").cast("long").as("rank"),
            col("left"), col("right"), col("freq"))
          .orderBy("rank")
      },
      Some(bpeReplayCtes(12) + "\n" + (1 to 12).map(i =>
        s"""SELECT CAST(${i - 1} AS BIGINT) AS rank, l AS "left", """ +
          s"""r AS "right", CAST(freq AS BIGINT) AS freq FROM b$i""")
        .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY rank"))),

    // BPE APPLY — the other half of the tokenizer lifecycle: encode the
    // corpus vocabulary with the trained merge table and report the 20
    // most frequent emitted tokens (weighted by word frequency). Encoding
    // runs over the DISTINCT word table (not the corpus): the 100 TB
    // corpus is touched once by wordCounts, and the merge table is a
    // broadcast-sized driver value folded into a typed map — the standard
    // tokenize-at-scale shape. Oracle-checked: encode() IS the trained
    // replay's final vocab state, so the same 12-block DuckDB chain
    // (bpeReplayCtes) replays training AND encoding; BpeTrainerSpec pins
    // encode() against hand-computed tokenizations.
    GraftQuery(
      "q133_bpe_apply",
      (s, dir) => {
        import s.implicits._
        val wc = BpeTrainer.wordCounts(
          Tables.spread(Tables(s, dir, "documents"), "doc_id"), "text")
        val ranked = BpeTrainer.train(wc, "word", "weight", nMerges = 12)
          .sortBy(_.rank).map(m => (m.left, m.right))
        val enc = wc.select(col("word").as[String], col("weight").as[Long])
          .map { case (w, n) => (BpeTrainer.encode(w, ranked), n) }
          .toDF("tokens", "weight")
        enc.select(explode(col("tokens")).as("token"), col("weight"))
          .groupBy("token")
          .agg(sum(col("weight")).as("n_occurrences"))
          .orderBy(col("n_occurrences").desc, col("token"))
          .limit(20)
      },
      Some(bpeReplayCtes(12) + """
        |SELECT token, CAST(SUM(w) AS BIGINT) AS n_occurrences
        |FROM (SELECT UNNEST(string_split(trim(s, '\u001f'), '\u001f'))
        |        AS token, w FROM v12)
        |GROUP BY token ORDER BY n_occurrences DESC, token LIMIT 20"""
        .stripMargin)),

    // Negative-sampling table — word2vec's unigram^(3/4) distribution as a
    // deterministic integer table: per-token weight = floor(count^0.75 ·
    // 10⁴) (one pow per DISTINCT token, rounded to an integer so the
    // cross-engine float surface is a single row-local op), cumulative
    // thresholds by a running window, and each token's expected share of a
    // 10⁶-draw table by integer division. Top-30 by weight.
    GraftQuery(
      "q178_negative_sampling_table",
      (s, dir) => {
        val counts = Tables.spread(Tables(s, dir, "documents"), "doc_id")
          .select(explode(split(col("text"), " ")).as("word"))
          .filter(col("word") =!= "")
          .groupBy(col("word")).agg(count(lit(1)).as("n"))
        val weighted = counts.withColumn("w",
          expr("CAST(floor(pow(CAST(n AS DOUBLE), 0.75) * 10000) AS BIGINT)"))
        // at 100 TB the vocabulary is 10⁷–10⁸ words: never rank it in ONE
        // task. Top-30 via orderBy+limit (TakeOrderedAndProject — per-
        // partition heaps, no global sort), then rank + prefix-sum only the
        // 30 survivors through the distributed scan; the global weight mass
        // is a plain partial+final aggregate broadcast back in.
        val top = weighted.orderBy(col("w").desc, col("word")).limit(30)
          .withColumn("neg_w", -col("w"))
        val scanned = graft.operators.DistributedPrefixSum.scan(
          top, Seq("neg_w", "word"), Seq("w"), idxName = "rnk", runPrefix = "cum_")
        val total = weighted.agg(sum(col("w")).as("total_w"))
        scanned.crossJoin(broadcast(total))
          .select(col("rnk"), col("word"), col("n"), col("w"), col("cum_w"),
            expr("(w * 1000000) div total_w").as("table_slots"))
          .orderBy("rnk")
      },
      Some("""WITH c AS (
        |  SELECT word, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE word <> '' GROUP BY word),
        |w AS (
        |  SELECT word, n,
        |    CAST(floor(pow(CAST(n AS DOUBLE), 0.75) * 10000) AS BIGINT) AS w
        |  FROM c),
        |r AS (
        |  SELECT word, n, w,
        |    CAST(row_number() OVER (ORDER BY w DESC, word) AS BIGINT) AS rnk,
        |    SUM(w) OVER (ORDER BY w DESC, word
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w,
        |    SUM(w) OVER () AS total_w
        |  FROM w)
        |SELECT rnk, word, n, w, CAST(cum_w AS BIGINT) AS cum_w,
        |  CAST((w * 1000000) // total_w AS BIGINT) AS table_slots
        |FROM r WHERE rnk <= 30 ORDER BY rnk""".stripMargin)),

    // Feature-hash collision audit — the hashing-trick health check: tokens
    // hashed into 4096 buckets via 3 md5 hex digits (portable both
    // engines), then occupancy stats vs the balls-in-bins expectation —
    // exact integer counts; only the expected-load comparison is float.
    GraftQuery(
      "q179_feature_hash_audit",
      (s, dir) => {
        val hexpos = graft.queries.hexDigitVal _
        val tokens = Tables.spread(Tables(s, dir, "documents"), "doc_id")
          .select(explode(split(col("text"), " ")).as("word"))
          .filter(col("word") =!= "").distinct()
        val h = md5(concat(lit("fh:"), col("word")))
        val bucketed = tokens.withColumn("bucket",
          (hexpos(substring(h, 1, 1)) * 256 + hexpos(substring(h, 2, 1)) * 16 +
            hexpos(substring(h, 3, 1))).cast("long"))
        val occ = bucketed.groupBy(col("bucket")).agg(count(lit(1)).as("load"))
        occ.agg(
            sum(col("load")).as("n_tokens"),
            count(lit(1)).as("n_buckets_used"),
            max(col("load")).as("max_load"),
            sum(when(col("load") > 1, col("load") - 1).otherwise(0L)).as("n_collisions"))
          .select(col("n_tokens"), col("n_buckets_used"), col("max_load"),
            col("n_collisions"),
            round(col("n_tokens").cast("double") / 4096.0, 6).as("expected_load"))
      },
      Some("""WITH t AS (
        |  SELECT DISTINCT word
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE word <> ''),
        |b AS (
        |  SELECT word,
        |    (instr('0123456789abcdef', substr(md5('fh:' || word), 1, 1)) - 1) * 256 +
        |    (instr('0123456789abcdef', substr(md5('fh:' || word), 2, 1)) - 1) * 16 +
        |    (instr('0123456789abcdef', substr(md5('fh:' || word), 3, 1)) - 1) AS bucket
        |  FROM t),
        |o AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS load FROM b GROUP BY 1)
        |SELECT CAST(SUM(load) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
        |  CAST(MAX(load) AS BIGINT) AS max_load,
        |  CAST(SUM(CASE WHEN load > 1 THEN load - 1 ELSE 0 END) AS BIGINT)
        |    AS n_collisions,
        |  round(CAST(SUM(load) AS DOUBLE) / 4096.0, 6) AS expected_load
        |FROM o""".stripMargin)))
  /** DuckDB replay of the BPE TRAINING loop (q98) and its encode twin
    * (q133): the vocabulary rides as a SEP-joined symbol string wrapped in
    * separators on both ends, so `replace(s, SEP||l||SEP||r||SEP,
    * SEP||lr||SEP)` IS [[BpeTrainer.mergePair]] — SQL replace scans
    * left-to-right and continues after each replacement, the exact
    * non-overlapping greedy semantics, and the wrapping separators make
    * every match symbol-boundary-aligned. Each of the `nMerges`
    * iterations is one MATERIALIZED CTE block (plain chaining would
    * re-inline the corpus scan 2^n times): adjacent-pair explode by list
    * comprehension, argmax with the engine's own (freq DESC, l, r)
    * byte-order tie-break, minFreq=2 as HAVING, and a no-best iteration
    * propagates the vocab unchanged — bit-identical to the trainer's
    * early stop. Shares [[BpeTrainer]]'s constants by construction.
    */
  private def bpeReplayCtes(nMerges: Int): String = {
    val sep = "\u001f" // US control char: cannot occur in whitespace-split words
    val head = s"""wc AS MATERIALIZED (
      |  SELECT word, CAST(COUNT(*) AS BIGINT) AS w
      |  FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
      |  WHERE length(word) > 0 GROUP BY word),
      |v0 AS MATERIALIZED (
      |  SELECT '$sep' || array_to_string(string_split_regex(word, ''), '$sep')
      |    || '$sep</w>$sep' AS s, w FROM wc)""".stripMargin
    val iters = (1 to nMerges).map { i =>
      val p = i - 1
      s"""b$i AS MATERIALIZED (
        |  SELECT u.pr.l AS l, u.pr.r AS r, SUM(w) AS freq
        |  FROM (SELECT w, UNNEST([{'l': lst[i], 'r': lst[i+1]}
        |          FOR i IN range(2, len(lst) - 1)]) AS pr
        |        FROM (SELECT string_split(s, '$sep') AS lst, w FROM v$p)) u
        |  GROUP BY 1, 2 HAVING SUM(w) >= 2
        |  ORDER BY freq DESC, l, r LIMIT 1),
        |v$i AS MATERIALIZED (
        |  SELECT CASE WHEN EXISTS (SELECT 1 FROM b$i)
        |    THEN replace(s, '$sep' || (SELECT l FROM b$i) || '$sep' ||
        |                    (SELECT r FROM b$i) || '$sep',
        |                 '$sep' || (SELECT l FROM b$i) ||
        |                    (SELECT r FROM b$i) || '$sep')
        |    ELSE s END AS s, w FROM v$p)""".stripMargin
    }
    (head +: iters).mkString("WITH ", ",\n", "")
  }

  /** DuckDB replay of the K-MEANS recurrence (q96/q99): `iters` Lloyd
    * iterations unrolled as MATERIALIZED CTE blocks. Every arithmetic step
    * replays the engine's own bit-exactly: the seeded md5 init pick, the
    * index-ordered (a-b)² fold (list_reduce without an initial value —
    * Spark's 0.0 seed is the identity for the all-nonnegative squares),
    * the argmin's (distance, cluster) tie-break as a window rank, and the
    * DECIMAL(30,10) centroid update — `CAST(x AS VARCHAR)` reproduces
    * Spark's shortest-representation double→decimal conversion, the sums
    * ride as exact HUGEINT 1e-10 units, HALF_UP division is integer
    * arithmetic, and the final 1e-10-unit integer fits 2^53 so
    * `CAST(.. AS DOUBLE) / 1e10` is the correctly-rounded double
    * BigDecimal.doubleValue produces. `fa` is the final assignment
    * (id, vec, cluster, d).
    */
  private def kmeansReplayCtes(k: Int, iters: Int, seed: Long): String = {
    val sq = "list_reduce(list_transform(list_zip(v.vec, c.cvec), " +
      "z -> (z[1] - z[2]) * (z[1] - z[2])), (acc, x) -> acc + x)"
    val head = s"""v AS MATERIALIZED (
      |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec
      |  FROM embeddings),
      |cc0 AS MATERIALIZED (
      |  SELECT (ROW_NUMBER() OVER (ORDER BY
      |    md5(CAST($seed AS VARCHAR) || ':' || CAST(id AS VARCHAR)), id)) - 1
      |    AS rn, vec AS cvec
      |  FROM v QUALIFY rn < $k)""".stripMargin
    val iterBlocks = (1 to iters).map { i =>
      val p = i - 1
      s"""a$i AS MATERIALIZED (
        |  SELECT id, vec, cluster, d FROM (
        |    SELECT v.id, v.vec, c.rn AS cluster, $sq AS d,
        |      ROW_NUMBER() OVER (PARTITION BY v.id ORDER BY $sq, c.rn) AS rk
        |    FROM v CROSS JOIN cc$p c)
        |  WHERE rk = 1),
        |s$i AS MATERIALIZED (
        |  SELECT cluster, pos,
        |    SUM(CAST(CAST(x AS VARCHAR) AS DECIMAL(30,10))) AS s,
        |    COUNT(*) AS n
        |  FROM (SELECT cluster, u.pos, vec[u.pos] AS x
        |        FROM a$i, UNNEST(range(1, len(vec) + 1)) AS u(pos))
        |  GROUP BY cluster, pos),
        |cc$i AS MATERIALIZED (
        |  SELECT c.rn,
        |    CASE WHEN ex.cluster IS NULL THEN c.cvec
        |      ELSE (SELECT list(
        |        CAST((CASE WHEN su >= 0 THEN 1 ELSE -1 END) *
        |          ((abs(su) * 2 + nn) // (2 * nn)) AS DOUBLE) / 10000000000.0
        |        ORDER BY pos)
        |        FROM (SELECT pos, CAST(s2.s * 10000000000 AS HUGEINT) AS su,
        |                s2.n AS nn
        |              FROM s$i s2 WHERE s2.cluster = c.rn))
        |      END AS cvec
        |  FROM cc$p c
        |  LEFT JOIN (SELECT DISTINCT cluster FROM s$i) ex ON ex.cluster = c.rn)"""
        .stripMargin
    }
    val fa = s"""fa AS MATERIALIZED (
      |  SELECT id, vec, cluster, d FROM (
      |    SELECT v.id, v.vec, c.rn AS cluster, $sq AS d,
      |      ROW_NUMBER() OVER (PARTITION BY v.id ORDER BY $sq, c.rn) AS rk
      |    FROM v CROSS JOIN cc$iters c)
      |  WHERE rk = 1)""".stripMargin
    ((head +: iterBlocks) :+ fa).mkString("WITH ", ",\n", "")
  }

}
