package graft.queries

import graft.{GraftQuery, QueryPack, Tables}
import org.apache.spark.sql.functions._

/** Deduplication surface over `documents` (north-star ops): exact hash
  * dedup, n-gram Jaccard near-dup, MinHash+LSH and SimHash variants — ALL
  * hash-checked against SQL oracles (the sketch pipelines are md5/integer
  * arithmetic by design, so DuckDB replays them exactly; ScalaTest
  * additionally pins est≈exact-Jaccard).
  *
  * Scale notes: exact dedup is one hash-shuffle on the digest; the shingle
  * self-join is bounded by LSH-style banding before the pairwise check at
  * 100 TB (see q40), never a full cross join.
  */
object Dedup extends QueryPack {

  /** MinHash permutation coefficients as a SQL VALUES body — built from the
    * SAME definition the engine hashes with, so the q40 oracle can never
    * drift from [[graft.functions.MinHash]].
    */
  private val minhashCoeffVals: String =
    graft.functions.MinHash.coefficients(16).zipWithIndex
      .map { case ((a, b), k) => s"($k, ${a}::BIGINT, ${b}::BIGINT)" }
      .mkString(", ")

  /** Shared CTE body replaying [[graft.functions.MinHash.candidatePairs]]
    * in ANSI SQL through the `est` frame (h60 hex-cast, literal affine
    * coefficients, 4×4 banding, matching-slot estimate) — used by q40's
    * oracle and, with a recursive-closure tail, q69's.
    */
  private lazy val minhashPairCtes: String =
    s"""t AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (
      |  SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
      |    FOR i IN generate_series(1, len(ws) - 2)]) AS s
      |  FROM t),
      |hh AS (
      |  SELECT doc_id,
      |    CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % 2147483647 AS h
      |  FROM sh),
      |c(k, a, b) AS (VALUES $minhashCoeffVals),
      |slots AS (
      |  SELECT doc_id, k, MIN((a * h + b) % 2147483647) AS v
      |  FROM hh CROSS JOIN c GROUP BY doc_id, k),
      |sigs AS (SELECT doc_id, list(v ORDER BY k) AS sig FROM slots GROUP BY doc_id),
      |banded AS (
      |  SELECT doc_id, j AS band,
      |    array_to_string(list_slice(sig, j*4 + 1, j*4 + 4), ',') AS bkey
      |  FROM sigs CROSS JOIN (SELECT unnest(range(0, 4)) AS j)),
      |cand AS (
      |  SELECT DISTINCT l.doc_id AS d1, r.doc_id AS d2
      |  FROM banded l JOIN banded r
      |    ON l.band = r.band AND l.bkey = r.bkey AND l.doc_id < r.doc_id),
      |est AS (
      |  SELECT d1, d2,
      |    len([i FOR i IN range(1, 17) IF s1.sig[i] = s2.sig[i]]) / 16.0 AS est_sim
      |  FROM cand JOIN sigs s1 ON s1.doc_id = cand.d1
      |            JOIN sigs s2 ON s2.doc_id = cand.d2)""".stripMargin

  /** Shared CTE body replaying [[graft.functions.SimHash.fingerprints]] in
    * ANSI SQL: h60 = first 15 hex digits of md5 (the TokenHasher contract),
    * per-bit majority vote over the document's words.
    */
  private val simhashFingerprintCtes: String =
    """w AS (
      |  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
      |    x -> x <> '')) AS word
      |  FROM documents),
      |wh AS (
      |  SELECT doc_id, CAST(('0x' || substr(md5(word), 1, 15)) AS BIGINT) AS h
      |  FROM w),
      |bits AS (
      |  SELECT doc_id, b,
      |    SUM(CASE WHEN ((h >> CAST(b AS INTEGER)) & 1) = 1 THEN 1 ELSE -1 END) AS s
      |  FROM wh CROSS JOIN (SELECT unnest(range(0, 60)) AS b)
      |  GROUP BY doc_id, b),
      |fp AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN s >= 0 THEN (1::BIGINT << CAST(b AS INTEGER))
      |             ELSE 0 END) AS BIGINT) AS simhash
      |  FROM bits GROUP BY doc_id),
      |nt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens
      |       FROM w GROUP BY doc_id)""".stripMargin

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q38_dedup_exact_sha256",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        val keep = d
          .groupBy(sha2(col("text"), 256).as("h"))
          .agg(min(col("doc_id")).as("keep_id"))
        d.join(keep, d("doc_id") === keep("keep_id"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
          .orderBy("lang")
      },
      Some("""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents d
        |JOIN (SELECT sha256(text) AS h, MIN(doc_id) AS keep_id
        |      FROM documents GROUP BY 1) k
        |  ON d.doc_id = k.keep_id
        |GROUP BY lang ORDER BY lang""".stripMargin)),

    GraftQuery(
      "q39_dedup_ngram_jaccard_pairs",
      (s, dir) => {
        // spread the single-row-group table before the shingle fan-out so
        // the explode runs at full parallelism (no-op at scale)
        val docs = Tables.spread(Tables(s, dir, "documents"), "doc_id")
          .select(col("doc_id"), split(col("text"), " ").as("ws"))
          .filter(size(col("ws")) >= 3)
        val sh = docs.select(col("doc_id"), explode(array_distinct(expr(
          "transform(sequence(0, size(ws) - 3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))")))
          .as("shingle"))
        val nsh = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
        // candidate pruning: a shingle held by a single doc can never form a
        // pair — drop it before the self-join (most shingles are unique, so
        // this shrinks the join input by an order of magnitude; results are
        // provably identical)
        val shared = sh.groupBy(col("shingle")).agg(count(lit(1)).as("ndocs"))
          .filter(col("ndocs") > 1).select(col("shingle"))
        val shJ = sh.join(shared, Seq("shingle"))
        val a = shJ.select(col("doc_id").as("d1"), col("shingle"))
        val b = shJ.select(col("doc_id").as("d2"), col("shingle"))
        val pairs = a.join(b, Seq("shingle")).filter(col("d1") < col("d2"))
          .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("inter"))
        pairs
          .join(nsh.select(col("doc_id").as("d1"), col("nsh").as("n1")), Seq("d1"))
          .join(nsh.select(col("doc_id").as("d2"), col("nsh").as("n2")), Seq("d2"))
          .withColumn("jaccard", col("inter") / (col("n1") + col("n2") - col("inter")))
          .filter(col("jaccard") >= 0.05)
          .select(col("d1"), col("d2"), col("inter"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("d1", "d2")
      },
      Some("""WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |     FOR i IN generate_series(1, len(ws) - 2)])) AS shingle
        |  FROM t),
        |n AS (SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
        |      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT d1, d2, CAST(inter AS BIGINT) AS inter,
        |  round(inter / (n1.nsh + n2.nsh - inter), 6) AS jaccard
        |FROM p JOIN n n1 ON p.d1 = n1.doc_id JOIN n n2 ON p.d2 = n2.doc_id
        |WHERE inter / (n1.nsh + n2.nsh - inter) >= 0.05
        |ORDER BY d1, d2""".stripMargin)),

    // Prefix-filtered exact Jaccard (AllPairs/PPJoin pruning) at a
    // dedup-grade threshold: candidates only need to share one of the
    // RAREST ceil((1-t)·n)+1 shingles, so the self-join never touches the
    // stopword-grade groups that dominate q39's shared-shingle join — yet
    // results are exact and share q39's oracle shape.
    GraftQuery(
      "q72_dedup_jaccard_prefix",
      (s, dir) => {
        graft.operators.PrefixFilterJoin
          .shinglePairs(Tables(s, dir, "documents"), "doc_id", "text", 0.6)
          .select(col("d1"), col("d2"), col("inter"),
            round(col("jaccard"), 6).as("jaccard"))
          .orderBy("d1", "d2")
      },
      Some("""WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |     FOR i IN generate_series(1, len(ws) - 2)])) AS shingle
        |  FROM t),
        |n AS (SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
        |      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT d1, d2, CAST(inter AS BIGINT) AS inter,
        |  round(inter / (n1.nsh + n2.nsh - inter), 6) AS jaccard
        |FROM p JOIN n n1 ON p.d1 = n1.doc_id JOIN n n2 ON p.d2 = n2.doc_id
        |WHERE inter / (n1.nsh + n2.nsh - inter) >= 0.6
        |ORDER BY d1, d2""".stripMargin)),

    // MinHash + LSH banding: signatures from md5-derived shingle hashes
    // (engine-portable), banded into buckets, candidate pairs within a
    // bucket. Estimated similarity = fraction of matching signature slots.
    // The whole pipeline is md5/integer arithmetic, so the oracle replays
    // it exactly: h60 via hex-cast, the 16 affine permutations as literal
    // coefficients from the engine's own definition, banding via list
    // slices. est≈exact-Jaccard is additionally pinned in ScalaTest.
    GraftQuery(
      "q40_dedup_minhash_lsh",
      (s, dir) => {
        import graft.functions.MinHash
        MinHash.candidatePairs(
          Tables(s, dir, "documents"), idCol = "doc_id", textCol = "text",
          numHashes = 16, bands = 4, shingleSize = 3)
          .orderBy("d1", "d2")
      },
      Some(s"""WITH $minhashPairCtes
        |SELECT d1, d2, round(est_sim, 4) AS est_sim FROM est
        |WHERE est_sim >= 0.25 ORDER BY d1, d2""".stripMargin)),

    // SimHash (60-bit, md5-derived word hashes): per-doc fingerprint.
    // Pure md5/bit arithmetic — the oracle replays the per-bit majority
    // vote exactly.
    GraftQuery(
      "q41_dedup_simhash",
      (s, dir) => {
        import graft.functions.SimHash
        SimHash.fingerprints(Tables(s, dir, "documents"), "doc_id", "text")
          .orderBy("doc_id")
      },
      Some(s"""WITH $simhashFingerprintCtes
        |SELECT fp.doc_id, simhash, n_tokens
        |FROM fp JOIN nt USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // Capstone curation pipeline (the end-to-end shape a training-data run
    // takes): language gate → quality gates (length, alpha ratio, stopword
    // floor) → exact dedup keeping the smallest doc_id → per-source stats.
    // One scan, one dedup shuffle, one final aggregation.
    GraftQuery(
      "q65_curation_pipeline",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
          .filter(col("lang") === "en")
          .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
          .withColumn("alpha_ratio",
            length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("double") / col("n_chars"))
          .withColumn("stop_hits", expr(
            "size(filter(split(lower(text), ' '), w -> w IN ('the','a','of','and','to','in')))").cast("long"))
          .filter(col("n_tokens") >= 5 && col("alpha_ratio") >= 0.5 && col("stop_hits") >= 1)
        // survivor = smallest doc_id per content hash, picked with ONE
        // window pass over the hash shuffle — the agg+self-join phrasing
        // (min(doc_id) → join back) evaluates the regex-heavy gate
        // projection twice; this is the same result in a single evaluation
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(sha2(col("text"), 256)).orderBy(col("doc_id"))
        d.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            round(avg(col("alpha_ratio")), 6).as("avg_alpha"),
            round(sum(col("n_chars")).cast("double") / count(lit(1)), 4).as("avg_chars"))
          .orderBy("source")
      },
      Some("""WITH f AS (
        |  SELECT doc_id, source, n_chars, text,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / n_chars AS alpha_ratio,
        |    CAST(len(list_filter(string_split(lower(text), ' '),
        |          w -> w IN ('the','a','of','and','to','in'))) AS BIGINT) AS stop_hits
        |  FROM documents WHERE lang = 'en'),
        |g AS (SELECT * FROM f
        |      WHERE n_tokens >= 5 AND alpha_ratio >= 0.5 AND stop_hits >= 1),
        |k AS (SELECT sha256(text) AS h, MIN(doc_id) AS keep_id FROM g GROUP BY 1)
        |SELECT source,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |  round(AVG(alpha_ratio), 6) AS avg_alpha,
        |  round(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 4) AS avg_chars
        |FROM g JOIN k ON g.doc_id = k.keep_id
        |GROUP BY source ORDER BY source""".stripMargin)),

    // Dedup clusters: MinHash-LSH candidate pairs → connected components →
    // one survivor (min doc_id) per cluster with the member list. The
    // engine runs iterative min-label propagation (O(diameter) shuffles —
    // the 100 TB path); the ORACLE replays the same fixpoint as a
    // recursive-CTE transitive closure over the replayed pair set
    // (component = min reachable id — identical by definition; the closure
    // is fine at oracle scale because pairs are the OUTPUT of LSH pruning).
    // Distributed≡driver equality is additionally pinned in
    // ConnectedComponentsSpec.
    GraftQuery(
      "q69_dedup_clusters",
      (s, dir) => {
        import graft.functions.MinHash
        import graft.operators.ConnectedComponents
        val pairs = MinHash.candidatePairs(
          Tables(s, dir, "documents"), idCol = "doc_id", textCol = "text",
          numHashes = 16, bands = 4, shingleSize = 3)
          .select(col("d1"), col("d2"))
        ConnectedComponents.run(pairs)
          .groupBy(col("component"))
          .agg(
            count(lit(1)).as("cluster_size"),
            min(col("node")).as("survivor_id"),
            concat_ws(",", array_sort(collect_list(col("node")))).as("members"))
          .orderBy("component")
      },
      Some(s"""WITH RECURSIVE $minhashPairCtes,
        |pairs AS (SELECT d1, d2 FROM est WHERE est_sim >= 0.25),
        |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
        |          UNION SELECT d2, d1 FROM pairs),
        |reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |comp AS (
        |  SELECT a AS node, least(a, MIN(b)) AS component
        |  FROM reach GROUP BY a)
        |SELECT CAST(component AS BIGINT) AS component,
        |  CAST(COUNT(*) AS BIGINT) AS cluster_size,
        |  CAST(MIN(node) AS BIGINT) AS survivor_id,
        |  array_to_string(list(node ORDER BY node), ',') AS members
        |FROM comp GROUP BY component ORDER BY component""".stripMargin)),

    // Banded SimHash near-dup join: pigeonhole banding shuffles on
    // (band, key) so only same-band docs meet (sub-quadratic), distance
    // filtered by the codegen'd hamming64 Catalyst expression. Exactness
    // vs brute force is pinned in HammingDistanceSpec; the oracle replays
    // the fingerprints AND the 6×10-bit banding (same pigeonhole guarantee,
    // so the replay is sub-quadratic in DuckDB too).
    GraftQuery(
      "q53_dedup_simhash_banded",
      (s, dir) => {
        import graft.functions.SimHash
        // maxDist=5: the corpus's true near-dups sit at d ≤ 5 while d ≥ 6 is
        // the combinatorial noise floor; 6 bands × 10 bits keeps buckets tiny
        SimHash.neardupPairs(Tables(s, dir, "documents"), "doc_id", "text",
          maxDist = 5)
          .orderBy("d1", "d2")
      },
      Some(s"""WITH $simhashFingerprintCtes,
        |banded AS (
        |  SELECT doc_id, simhash, j AS band,
        |    (simhash >> CAST(j*10 AS INTEGER)) & 1023 AS bkey
        |  FROM fp CROSS JOIN (SELECT unnest(range(0, 6)) AS j)),
        |pairs AS (
        |  SELECT DISTINCT l.doc_id AS d1, r.doc_id AS d2,
        |    CAST(bit_count(xor(l.simhash, r.simhash)) AS INTEGER) AS dist
        |  FROM banded l JOIN banded r
        |    ON l.band = r.band AND l.bkey = r.bkey AND l.doc_id < r.doc_id)
        |SELECT d1, d2, dist FROM pairs WHERE dist <= 5
        |ORDER BY d1, d2""".stripMargin)),

    // Substring-level duplication (the Lee et al. '22 "Deduplicating
    // Training Data" problem shape): fixed 48-char windows at stride 16
    // over every document; two documents sharing ANY window share a ≥48-char
    // verbatim span. Pairs ranked by how many distinct windows they share.
    // Scale shape: the window table shuffles once on the window string
    // (hash-partitioned); a doc-frequency cap (df ≤ 100, mirrored in the
    // oracle) bounds the hot-window group blowup exactly like the stop-token
    // prune in AllPairs — boilerplate shared by thousands of docs is layout,
    // not plagiarism, and would otherwise 100²-explode the pair join.
    GraftQuery(
      "q132_substring_dedup",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .where(length(col("text")) >= 48)
          .select(col("doc_id"), col("text"))
        val wins = docs
          .select(col("doc_id"),
            explode(expr("transform(sequence(1, length(text) - 47, 16), " +
              "p -> substring(text, p, 48))")).as("win"))
          .distinct()
        val bounded = wins
          .groupBy(col("win")).agg(collect_list(col("doc_id")).as("ds"),
            count(lit(1)).as("df"))
          .where(col("df").between(2, 100))
        bounded
          .select(explode(expr(
            "filter(flatten(transform(ds, a -> transform(ds, b -> struct(a AS d1, b AS d2)))), " +
              "p -> p.d1 < p.d2)")).as("p"))
          .groupBy(col("p.d1").as("d1"), col("p.d2").as("d2"))
          .agg(count(lit(1)).as("n_shared_windows"))
          .orderBy(col("n_shared_windows").desc, col("d1"), col("d2"))
          .limit(20)
      },
      Some("""WITH d AS (
        |  SELECT doc_id, text FROM documents WHERE length(text) >= 48),
        |w AS (
        |  SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 48) AS win
        |  FROM (SELECT doc_id, text,
        |          unnest(generate_series(1, length(text) - 47, 16)) AS i
        |        FROM d)),
        |b AS (
        |  SELECT win FROM w GROUP BY win HAVING count(*) BETWEEN 2 AND 100),
        |p AS (
        |  SELECT w1.doc_id AS d1, w2.doc_id AS d2
        |  FROM w w1 JOIN w w2 ON w1.win = w2.win AND w1.doc_id < w2.doc_id
        |  JOIN b ON w1.win = b.win)
        |SELECT d1, d2, CAST(count(*) AS BIGINT) AS n_shared_windows
        |FROM p GROUP BY 1, 2
        |ORDER BY n_shared_windows DESC, d1, d2 LIMIT 20""".stripMargin)),

    // Dataset card — the one-row corpus summary a data release publishes:
    // sizes, language/source diversity, exact duplicate rate (md5 groups),
    // and central length stats. Everything integer-exact except the two
    // rounded ratios and the q57-parity median.
    GraftQuery(
      "q186_dataset_card",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        val dups = d.groupBy(md5(col("text")).as("h"))
          .agg(count(lit(1)).as("n"))
          .agg(sum(col("n") - 1).as("n_dup_docs"), count(lit(1)).as("n_unique"))
        d.agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            countDistinct(col("lang")).as("n_langs"),
            countDistinct(col("source")).as("n_sources"),
            round(expr("percentile(n_chars, 0.5)"), 4).as("p50_chars"))
          .crossJoin(dups)
          .select(col("n_docs"), col("total_chars"), col("n_langs"),
            col("n_sources"), col("p50_chars"), col("n_unique"),
            col("n_dup_docs"),
            round(col("n_dup_docs").cast("double") / col("n_docs"), 6).as("dup_rate"),
            round(col("total_chars").cast("double") / col("n_docs"), 6)
              .as("mean_chars"))
      },
      Some("""WITH dups AS (
        |  SELECT CAST(SUM(n - 1) AS BIGINT) AS n_dup_docs,
        |    CAST(COUNT(*) AS BIGINT) AS n_unique
        |  FROM (SELECT md5(text) AS h, COUNT(*) AS n FROM documents GROUP BY 1)),
        |base AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        |    CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
        |    round(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 4) AS p50_chars
        |  FROM documents)
        |SELECT n_docs, total_chars, n_langs, n_sources, p50_chars, n_unique,
        |  n_dup_docs,
        |  round(CAST(n_dup_docs AS DOUBLE) / n_docs, 6) AS dup_rate,
        |  round(CAST(total_chars AS DOUBLE) / n_docs, 6) AS mean_chars
        |FROM base, dups""".stripMargin)),

    // Duplicate-cluster size histogram — dedup diagnostics: how many md5
    // groups have exactly 1, 2, 3… members, plus the rows each size class
    // would delete. Exact; the long tail's shape decides whether exact
    // dedup suffices or near-dup is needed.
    GraftQuery(
      "q187_dup_cluster_histogram",
      (s, dir) => {
        Tables(s, dir, "documents")
          .groupBy(md5(col("text")).as("h"))
          .agg(count(lit(1)).as("sz"))
          .groupBy(col("sz"))
          .agg(count(lit(1)).as("n_clusters"),
            (sum(col("sz")) - count(lit(1))).as("rows_removable"))
          .orderBy("sz")
      },
      Some("""SELECT CAST(sz AS BIGINT) AS sz,
        |  CAST(COUNT(*) AS BIGINT) AS n_clusters,
        |  CAST(SUM(sz) - COUNT(*) AS BIGINT) AS rows_removable
        |FROM (SELECT md5(text) AS h, COUNT(*) AS sz FROM documents GROUP BY 1)
        |GROUP BY sz ORDER BY sz""".stripMargin)),

    // Source-overlap matrix — exact Jaccard of the md5-hash sets between
    // every source pair: which feeds are re-crawls of each other. The
    // distinct (source, hash) frame self-joins on hash (bounded by true
    // duplicate mass, not |A|·|B|), unions per-source set sizes once.
    GraftQuery(
      "q188_source_overlap",
      (s, dir) => {
        val sh = Tables(s, dir, "documents")
          .select(col("source"), md5(col("text")).as("h")).distinct()
        val sizes = sh.groupBy(col("source")).agg(count(lit(1)).as("sz"))
        val inter = sh.as("a").join(sh.as("b"), Seq("h"))
          .filter(col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
          .agg(count(lit(1)).as("n_common"))
        // every source pair appears, zero-overlap included — the report must
        // say "no overlap" explicitly (and stay non-empty at tiny SFs)
        val pairs = sizes.select(col("source").as("s1"), col("sz").as("sz1"))
          .crossJoin(sizes.select(col("source").as("s2"), col("sz").as("sz2")))
          .filter(col("s1") < col("s2"))
        pairs.join(inter, Seq("s1", "s2"), "left")
          .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
          .select(col("s1"), col("s2"), col("n_common"), col("sz1"), col("sz2"),
            round(col("n_common").cast("double")
              / (col("sz1") + col("sz2") - col("n_common")).cast("double"), 6)
              .as("jaccard"))
          .orderBy(col("jaccard").desc, col("s1"), col("s2"))
          .limit(15)
      },
      Some("""WITH sh AS (
        |  SELECT DISTINCT source, md5(text) AS h FROM documents),
        |sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY 1),
        |i AS (
        |  SELECT a.source AS s1, b.source AS s2, CAST(COUNT(*) AS BIGINT) AS n_common
        |  FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT x.source AS s1, y.source AS s2,
        |  CAST(COALESCE(i.n_common, 0) AS BIGINT) AS n_common,
        |  x.sz AS sz1, y.sz AS sz2,
        |  round(CAST(COALESCE(i.n_common, 0) AS DOUBLE)
        |        / CAST(x.sz + y.sz - COALESCE(i.n_common, 0) AS DOUBLE), 6) AS jaccard
        |FROM sz x JOIN sz y ON x.source < y.source
        |LEFT JOIN i ON i.s1 = x.source AND i.s2 = y.source
        |ORDER BY jaccard DESC, s1, s2 LIMIT 15""".stripMargin)),

    // Capture-recapture corpus-size estimate — treat two deterministic
    // half-samples of the doc-hash universe (md5 parity split) as two
    // "captures"; the Chapman estimator Ñ = (n1+1)(n2+1)/(m+1) − 1 then
    // estimates the TRUE distinct count, compared against the exact one.
    // The estimator every crawl-frontier sizing exercise uses when the
    // universe can't be enumerated; here its error is measurable because
    // the universe CAN be (integer arithmetic, one division).
    GraftQuery(
      "q194_capture_recapture",
      (s, dir) => {
        val hexpos = graft.queries.hexDigitVal _
        val h = Tables(s, dir, "documents")
          .select(md5(col("text")).as("h")).distinct()
          // two overlapping deterministic captures from independent digits
          .withColumn("in1", (hexpos(substring(col("h"), 1, 1)) < 12).cast("int"))
          .withColumn("in2", (hexpos(substring(col("h"), 2, 1)) < 12).cast("int"))
        h.agg(count(lit(1)).as("n_true"),
            sum(col("in1")).cast("long").as("n1"),
            sum(col("in2")).cast("long").as("n2"),
            sum(col("in1") * col("in2")).cast("long").as("m"))
          .select(col("n_true"), col("n1"), col("n2"), col("m"),
            expr("((n1 + 1) * (n2 + 1)) div (m + 1) - 1").as("n_chapman"),
            (expr("((n1 + 1) * (n2 + 1)) div (m + 1) - 1") - col("n_true"))
              .as("est_error"))
      },
      Some("""WITH u AS (
        |  SELECT DISTINCT md5(text) AS h FROM documents),
        |f AS (
        |  SELECT h,
        |    CASE WHEN instr('0123456789abcdef', substr(h, 1, 1)) - 1 < 12
        |         THEN 1 ELSE 0 END AS in1,
        |    CASE WHEN instr('0123456789abcdef', substr(h, 2, 1)) - 1 < 12
        |         THEN 1 ELSE 0 END AS in2
        |  FROM u)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_true,
        |  CAST(SUM(in1) AS BIGINT) AS n1,
        |  CAST(SUM(in2) AS BIGINT) AS n2,
        |  CAST(SUM(in1 * in2) AS BIGINT) AS m,
        |  CAST(((SUM(in1) + 1) * (SUM(in2) + 1)) // (SUM(in1 * in2) + 1) - 1
        |    AS BIGINT) AS n_chapman,
        |  CAST(((SUM(in1) + 1) * (SUM(in2) + 1)) // (SUM(in1 * in2) + 1) - 1
        |    - COUNT(*) AS BIGINT) AS est_error
        |FROM f""".stripMargin))
  )
}
