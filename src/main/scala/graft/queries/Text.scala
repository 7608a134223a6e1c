package graft.queries

import graft.{GraftQuery, QueryPack, Tables}
import org.apache.spark.sql.functions._

/** Text-analysis surface over `documents` (north-star ops, SURVEY.md §2.2):
  * tokenization + word counts, n-gram-heuristic language ID, quality
  * scoring, token counting (whitespace + regex), document fingerprinting.
  */
object Text extends QueryPack {

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q33_text_wordcount_top20",
      (s, dir) => {
        Tables.spread(Tables(s, dir, "documents"), "doc_id")
          .select(explode(split(col("text"), " ")).as("word"))
          .filter(col("word") =!= "")
          .groupBy(col("word"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("word"))
          .limit(20)
      },
      Some("""SELECT word, CAST(COUNT(*) AS BIGINT) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
        |WHERE word <> ''
        |GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin)),

    GraftQuery(
      "q34_text_langid_stopwords",
      (s, dir) => {
        Tables(s, dir, "documents")
          .withColumn("ws", split(lower(col("text")), " "))
          .withColumn("score_de", expr(
            "size(filter(ws, w -> w IN ('der','die','das','und','ist','ein')))").cast("long"))
          .withColumn("score_en", expr(
            "size(filter(ws, w -> w IN ('the','a','of','and','to','in')))").cast("long"))
          .withColumn("score_es", expr(
            "size(filter(ws, w -> w IN ('el','los','las','y','es','un')))").cast("long"))
          .withColumn("score_fr", expr(
            "size(filter(ws, w -> w IN ('le','la','les','et','est','une')))").cast("long"))
          .withColumn("pred_lang", expr(
            """CASE
              |  WHEN score_de >= score_en AND score_de >= score_es AND score_de >= score_fr THEN 'de'
              |  WHEN score_en >= score_es AND score_en >= score_fr THEN 'en'
              |  WHEN score_es >= score_fr THEN 'es'
              |  ELSE 'fr' END""".stripMargin))
          .select(col("doc_id"), col("lang"), col("pred_lang"),
            col("score_en"), col("score_de"), col("score_es"), col("score_fr"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
        |  SELECT doc_id, lang, string_split(lower(text), ' ') AS ws FROM documents),
        |sc AS (
        |  SELECT doc_id, lang,
        |    CAST(len(list_filter(ws, w -> w IN ('der','die','das','und','ist','ein'))) AS BIGINT) AS score_de,
        |    CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','to','in'))) AS BIGINT) AS score_en,
        |    CAST(len(list_filter(ws, w -> w IN ('el','los','las','y','es','un'))) AS BIGINT) AS score_es,
        |    CAST(len(list_filter(ws, w -> w IN ('le','la','les','et','est','une'))) AS BIGINT) AS score_fr
        |  FROM t)
        |SELECT doc_id, lang,
        |  CASE
        |    WHEN score_de >= score_en AND score_de >= score_es AND score_de >= score_fr THEN 'de'
        |    WHEN score_en >= score_es AND score_en >= score_fr THEN 'en'
        |    WHEN score_es >= score_fr THEN 'es'
        |    ELSE 'fr' END AS pred_lang,
        |  score_en, score_de, score_es, score_fr
        |FROM sc ORDER BY doc_id""".stripMargin)),

    GraftQuery(
      "q35_text_quality_score",
      (s, dir) => {
        Tables(s, dir, "documents")
          .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
          .withColumn("n_alpha",
            length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("long"))
          .withColumn("stop_hits", expr(
            "size(filter(split(lower(text), ' '), w -> w IN ('the','a','of','and','to','in')))").cast("long"))
          .select(
            col("doc_id"), col("n_chars"), col("n_tokens"),
            (col("n_alpha") / col("n_chars")).as("alpha_ratio"),
            (col("stop_hits") / col("n_tokens")).as("stopword_ratio"),
            (least(col("n_tokens") / lit(100.0), lit(1.0)) *
              (lit(0.5) + lit(0.5) * (col("stop_hits") / col("n_tokens")))).as("quality"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
        |  SELECT doc_id, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha,
        |    CAST(len(list_filter(string_split(lower(text), ' '),
        |          w -> w IN ('the','a','of','and','to','in'))) AS BIGINT) AS stop_hits
        |  FROM documents)
        |SELECT doc_id, n_chars, n_tokens,
        |  n_alpha / n_chars AS alpha_ratio,
        |  stop_hits / n_tokens AS stopword_ratio,
        |  least(n_tokens / 100.0, 1.0) * (0.5 + 0.5 * (stop_hits / n_tokens)) AS quality
        |FROM t ORDER BY doc_id""".stripMargin)),

    GraftQuery(
      "q36_text_token_counts",
      (s, dir) => {
        Tables(s, dir, "documents")
          .select(
            col("doc_id"),
            size(split(col("text"), "\\s+")).cast("long").as("ws_tokens"),
            expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+', 0))").cast("long")
              .as("re_tokens"),
            length(col("text")).cast("long").as("n_chars_measured"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
        |  CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS re_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars_measured
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // TF-IDF top terms: tf = in-doc count, idf = ln(N / docs-containing),
    // top-3 per doc with full tie-break. One tokenize pass, two shuffles
    // (per-(doc,word) and per-word aggregation) — the scale-honest layout.
    GraftQuery(
      "q62_text_tfidf_top_terms",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.spread(Tables(s, dir, "documents"), "doc_id")
        val n = docs.count()
        val tok = docs
          .filter(col("doc_id") < 100)
          .select(col("doc_id"),
            explode(expr("filter(split(lower(text), ' '), w -> w <> '')")).as("word"))
        val allTok = docs.select(col("doc_id"),
          explode(expr("filter(split(lower(text), ' '), w -> w <> '')")).as("word"))
        val tf = tok.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
        val dfreq = allTok.select("doc_id", "word").distinct()
          .groupBy("word").agg(count(lit(1)).as("df"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("word").asc)
        tf.join(dfreq, Seq("word"))
          .withColumn("tfidf", round(col("tf") * log(lit(n.toDouble) / col("df")), 6))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("doc_id"), col("word"), col("tf"), col("df"),
            col("tfidf"), col("rnk").cast("long").as("rnk"))
          .orderBy("doc_id", "rnk")
      },
      Some("""WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
        |                                    w -> w <> '')) AS word
        |  FROM documents),
        |tf AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
        |       FROM tok WHERE doc_id < 100 GROUP BY 1, 2),
        |dfreq AS (SELECT word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        |          FROM tok GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |scored AS (
        |  SELECT doc_id, word, tf, df,
        |    round(tf * ln(n.n / df), 6) AS tfidf
        |  FROM tf JOIN dfreq USING (word) CROSS JOIN n),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |                               ORDER BY tfidf DESC, word) AS rnk
        |  FROM scored)
        |SELECT doc_id, word, tf, df, tfidf, CAST(rnk AS BIGINT) AS rnk
        |FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin)),

    GraftQuery(
      "q37_text_fingerprint",
      (s, dir) => {
        Tables(s, dir, "documents")
          .withColumn("norm", lower(trim(regexp_replace(col("text"), "\\s+", " "))))
          .select(
            col("doc_id"),
            md5(col("norm")).as("fp"),
            md5(array_join(array_sort(array_distinct(split(col("norm"), " "))), " "))
              .as("bag_fp"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
        |  SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
        |  FROM documents)
        |SELECT doc_id, md5(norm) AS fp,
        |  md5(array_to_string(list_sort(list_distinct(string_split(norm, ' '))), ' ')) AS bag_fp
        |FROM t ORDER BY doc_id""".stripMargin)),

    // Repetition-based quality filters (the Gopher/MassiveText rules recast
    // for unstructured word streams): per-doc top-word fraction and
    // duplicate-2-gram fraction, flagged against the published-style
    // thresholds, aggregated per language. One scan, one shuffle; the
    // per-doc mode is an O(len²) array fold bounded by doc length, never a
    // join.
    GraftQuery(
      "q74_text_repetition_filters",
      (s, dir) => {
        Tables.spread(Tables(s, dir, "documents"), "doc_id")
          .select(col("doc_id"), col("lang"), split(col("text"), " ").as("ws"))
          .filter(size(col("ws")) >= 2)
          .withColumn("n_tokens", size(col("ws")).cast("long"))
          .withColumn("top_word_n", expr(
            "array_max(transform(array_distinct(ws), w -> size(filter(ws, x -> x = w))))"))
          .withColumn("grams2", expr(
            "transform(sequence(0, size(ws) - 2), i -> concat_ws(' ', ws[i], ws[i+1]))"))
          .withColumn("n2", size(col("grams2")))
          .withColumn("d2", size(array_distinct(col("grams2"))))
          .withColumn("top_word_frac", col("top_word_n") / col("n_tokens"))
          .withColumn("dup_2gram_frac", (col("n2") - col("d2")) / col("n2"))
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("top_word_frac") > 0.1 || col("dup_2gram_frac") > 0.15, 1L)
              .otherwise(0L)).as("n_flagged"),
            round(avg(col("top_word_frac")), 6).as("avg_top_word_frac"),
            round(avg(col("dup_2gram_frac")), 6).as("avg_dup_2gram_frac"))
          .orderBy("lang")
      },
      Some("""WITH t AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
        |m AS (
        |  SELECT doc_id, lang,
        |    CAST(len(ws) AS BIGINT) AS n_tokens,
        |    list_max([len(list_filter(ws, x -> x = w)) FOR w IN list_distinct(ws)]) AS top_word_n,
        |    len([ws[i] || ' ' || ws[i+1] FOR i IN generate_series(1, len(ws)-1)]) AS n2,
        |    len(list_distinct([ws[i] || ' ' || ws[i+1] FOR i IN generate_series(1, len(ws)-1)])) AS d2
        |  FROM t WHERE len(ws) >= 2)
        |SELECT lang,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN top_word_n / n_tokens > 0.1 OR (n2 - d2) / n2 > 0.15
        |       THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
        |  round(AVG(top_word_n / n_tokens), 6) AS avg_top_word_frac,
        |  round(AVG((n2 - d2) / n2), 6) AS avg_dup_2gram_frac
        |FROM m GROUP BY lang ORDER BY lang""".stripMargin)),

    // Benchmark decontamination: flag training docs sharing any distinct
    // word-4-gram with the "benchmark" partition (doc_id % 10 = 0 stands in
    // for an eval suite). Shape: explode distinct 4-grams once, semi-join
    // train-side grams against the (much smaller) eval gram set, aggregate
    // per doc then per language — the canonical overlap-decontamination
    // pass run before every pretraining cut.
    GraftQuery(
      "q75_text_decontamination",
      (s, dir) => {
        val g = Tables.spread(Tables(s, dir, "documents"), "doc_id")
          .select(col("doc_id"), col("lang"), split(col("text"), " ").as("ws"))
          .filter(size(col("ws")) >= 4)
          .select(col("doc_id"), col("lang"), explode(array_distinct(expr(
            "transform(sequence(0, size(ws) - 4), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3]))")))
            .as("gram"))
        val evalGrams = g.filter(col("doc_id") % 10 === 0)
          .select(col("gram")).distinct()
        g.filter(col("doc_id") % 10 =!= 0)
          .join(evalGrams, Seq("gram"), "left_semi")
          .groupBy(col("doc_id"), col("lang"))
          .agg(count(lit(1)).as("shared"))
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_contaminated"),
            sum(col("shared")).as("total_shared"),
            max(col("shared")).as("max_shared"))
          .orderBy("lang")
      },
      Some("""WITH t AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents
        |  WHERE len(string_split(text, ' ')) >= 4),
        |g AS (
        |  SELECT doc_id, lang, unnest(list_distinct(
        |    [list_aggregate(ws[i:i+3], 'string_agg', ' ') FOR i IN generate_series(1, len(ws)-3)])) AS gram
        |  FROM t),
        |eval_g AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0),
        |hits AS (
        |  SELECT g.doc_id, g.lang, COUNT(*) AS shared
        |  FROM g JOIN eval_g USING (gram) WHERE g.doc_id % 10 <> 0
        |  GROUP BY 1, 2)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_contaminated,
        |  CAST(SUM(shared) AS BIGINT) AS total_shared,
        |  CAST(MAX(shared) AS BIGINT) AS max_shared
        |FROM hits GROUP BY lang ORDER BY lang""".stripMargin)),

    // Exact heavy hitters via the two-pass Misra–Gries pattern: the sketch
    // pass shuffles ≤ k counters per map task (not the token stream), its
    // no-miss guarantee nominates every ≥ phi candidate, and the exact pass
    // re-counts candidates behind a pushed-down IN filter. Output equals the
    // naive full groupBy + HAVING — which is exactly the oracle.
    GraftQuery(
      "q77_heavy_hitters",
      (s, dir) => {
        val words = Tables.spread(Tables(s, dir, "documents"), "doc_id")
          .select(explode(split(col("text"), " ")).as("word"))
          .filter(col("word") =!= "")
        graft.functions.MisraGries.heavyHitters(words, col("word"), phi = 0.03, k = 64)
          .select(col("token").as("word"), col("n"))
          .orderBy("word")
      },
      Some("""WITH w AS (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents),
        |f AS (SELECT word FROM w WHERE word <> ''),
        |t AS (SELECT COUNT(*) AS n_total FROM f)
        |SELECT word, CAST(COUNT(*) AS BIGINT) AS n
        |FROM f GROUP BY word
        |HAVING COUNT(*) > 0.03 * (SELECT n_total FROM t)
        |ORDER BY word""".stripMargin)),

    // Containment-fraction decontamination (the metric variant of q75's
    // membership test): for each EVAL document, what fraction of its
    // distinct 4-grams appear anywhere in the train split — the number an
    // eval-suite owner actually thresholds on. Severity buckets aggregate
    // exact integer hit/total counts (the rate is a ratio of summed
    // BIGINTs, never a cross-row float sum). Scale shape: one gram explode,
    // one distinct train-gram shuffle, one semi-join — the eval side is
    // tiny by construction, the train side shuffles once.
    GraftQuery(
      "q137_ngram_containment",
      (s, dir) => {
        val g = Tables.spread(Tables(s, dir, "documents"), "doc_id")
          .select(col("doc_id"), split(col("text"), " ").as("ws"))
          .filter(size(col("ws")) >= 4)
          .select(col("doc_id"), explode(array_distinct(expr(
            "transform(sequence(0, size(ws) - 4), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3]))")))
            .as("gram"))
        val trainGrams = g.filter(col("doc_id") % 10 =!= 0)
          .select(col("gram")).distinct()
        val perDoc = g.filter(col("doc_id") % 10 === 0)
          .join(trainGrams.withColumn("hit", lit(1L)), Seq("gram"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_grams"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        val frac = col("n_hit").cast("double") / col("n_grams").cast("double")
        perDoc
          .select(col("doc_id"), col("n_grams"), col("n_hit"),
            when(frac >= 0.5, "high").when(frac >= 0.1, "partial")
              .when(frac > 0.0, "trace").otherwise("clean").as("bucket"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_hit")).as("total_hits"),
            sum(col("n_grams")).as("total_grams"))
          .select(col("bucket"), col("n_docs"), col("total_hits"), col("total_grams"),
            round(col("total_hits").cast("double") / col("total_grams").cast("double"), 6)
              .as("hit_rate"))
          .orderBy("bucket")
      },
      Some("""WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |  WHERE len(string_split(text, ' ')) >= 4),
        |g AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [list_aggregate(ws[i:i+3], 'string_agg', ' ') FOR i IN generate_series(1, len(ws)-3)])) AS gram
        |  FROM t),
        |tg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 <> 0),
        |pd AS (
        |  SELECT g.doc_id, COUNT(*) AS n_grams,
        |    SUM(CASE WHEN tg.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
        |  FROM g LEFT JOIN tg ON g.gram = tg.gram WHERE g.doc_id % 10 = 0
        |  GROUP BY 1),
        |b AS (
        |  SELECT doc_id, n_grams, n_hit,
        |    CASE WHEN CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE) >= 0.5 THEN 'high'
        |         WHEN CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE) >= 0.1 THEN 'partial'
        |         WHEN CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE) > 0.0 THEN 'trace'
        |         ELSE 'clean' END AS bucket
        |  FROM pd)
        |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_hit) AS BIGINT) AS total_hits,
        |  CAST(SUM(n_grams) AS BIGINT) AS total_grams,
        |  round(CAST(SUM(n_hit) AS DOUBLE) / CAST(SUM(n_grams) AS DOUBLE), 6)
        |    AS hit_rate
        |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // Lexicon tagging via the Aho–Corasick automaton: all keywords matched
    // against every document in ONE text pass (broadcast automaton,
    // mapPartitions — see operators.KeywordMatcher). The oracle counts the
    // same substring occurrences by replace-length arithmetic, exact for
    // these border-free keywords (no self-overlap possible; overlap
    // semantics pinned separately in KeywordMatcherSpec).
    GraftQuery(
      "q144_keyword_tagging",
      (s, dir) => {
        val kws = Seq("merge", "scan", "spark", "stream", "table", "vector")
        graft.operators.KeywordMatcher
          .tagCounts(s, Tables(s, dir, "documents"), "doc_id", "text", kws)
          .orderBy("keyword")
      },
      Some {
        val kws = Seq("merge", "scan", "spark", "stream", "table", "vector")
        val arms = kws.map { kw =>
          s"""SELECT '$kw' AS keyword,
             CAST(SUM(CASE WHEN contains(text, '$kw') THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
             CAST(SUM((length(text) - length(replace(text, '$kw', ''))) // ${kw.length}) AS BIGINT)
               AS n_occurrences
             FROM documents"""
        }
        arms.mkString(" UNION ALL ") + " ORDER BY keyword"
      }),

    // Per-group heavy hitters — q77's global Misra–Gries made group-local,
    // and a second exercise of the custom TopKPerGroup physical operator on
    // a different type shape (string group key, (count desc, word asc)
    // order). The shuffle above the word-count agg carries ≤ 3 rows per
    // (lang, map partition); rank is rebuilt over the 3·langs-row result.
    GraftQuery(
      "q148_heavy_hitters_per_lang",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val counts = Tables.spread(Tables(s, dir, "documents"), "doc_id")
          .select(col("lang"), explode(split(col("text"), " ")).as("word"))
          .filter(col("word") =!= "")
          .groupBy(col("lang"), col("word"))
          .agg(count(lit(1)).as("n"))
        val top = graft.plans.TopKPerGroup(
          counts, Seq("lang"), Seq(("n", false), ("word", true)), 3)
        val w = Window.partitionBy("lang").orderBy(col("n").desc, col("word").asc)
        top.withColumn("rnk", row_number().over(w).cast("long"))
          .select(col("lang"), col("word"), col("n"), col("rnk"))
          .orderBy("lang", "rnk")
      },
      Some("""SELECT lang, word, n, CAST(rnk AS BIGINT) AS rnk
        |FROM (SELECT lang, word, n,
        |        row_number() OVER (PARTITION BY lang ORDER BY n DESC, word) AS rnk
        |      FROM (SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS n
        |            FROM (SELECT lang, unnest(string_split(text, ' ')) AS word
        |                  FROM documents) t
        |            WHERE word <> '' GROUP BY lang, word) c) r
        |WHERE rnk <= 3 ORDER BY lang, rnk""".stripMargin)),

    // RAG-style chunking: every document sliced into 500-char windows with
    // 100-char overlap (stride 400) — the retrieval-corpus preparation step.
    // Offsets come from `sequence`/`generate_series` (no UDF, fully
    // vectorized), chunk content is pinned by md5 so the substring
    // arithmetic must agree byte-for-byte cross-engine; q88's packing is the
    // whole-doc concatenate-and-split sibling.
    GraftQuery(
      "q154_rag_chunking",
      (s, dir) => {
        val size = 500
        val stride = 400
        Tables.spread(Tables(s, dir, "documents"), "doc_id")
          .select(col("doc_id"), col("text"),
            explode(expr(s"sequence(0L, greatest(n_chars - 1, 0L), ${stride}L)")).as("off"))
          .select(col("doc_id"), expr(s"off div $stride").as("chunk_idx"), col("off"),
            expr(s"substring(text, CAST(off + 1 AS INT), $size)").as("chunk"))
          .select(col("doc_id"), col("chunk_idx"), col("off"),
            length(col("chunk")).cast("long").as("chunk_len"),
            md5(col("chunk")).as("chunk_md5"))
          .orderBy("doc_id", "chunk_idx")
      },
      Some("""SELECT doc_id, off // 400 AS chunk_idx, off,
        |  CAST(length(chunk) AS BIGINT) AS chunk_len, md5(chunk) AS chunk_md5
        |FROM (
        |  SELECT doc_id,
        |    unnest(generate_series(0, greatest(n_chars - 1, 0), 400)) AS off,
        |    text
        |  FROM documents) t,
        |LATERAL (SELECT substr(text, CAST(off + 1 AS BIGINT), 500) AS chunk) c
        |ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Collocation mining: pointwise mutual information over co-occurring
    // vocabulary tokens — PMI = ln(P(a,b)/(P(a)·P(b))) at document grain,
    // the association score behind phrase detection and word2vec negative
    // sampling. Counts are exact integers; the single ln over a rational
    // runs once per surviving pair and rounds to 6 (q62's proven-green
    // idiom). Vocabulary capped at the top 40 tokens so the pair space is
    // bounded (≤ 780 candidates) regardless of corpus size.
    GraftQuery(
      "q162_token_pmi",
      (s, dir) => {
        val docs = Tables.spread(Tables(s, dir, "documents"), "doc_id")
        val words = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
          .filter(col("word") =!= "")
        val vocab = words.groupBy(col("word")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("word")).limit(40)
          .select(col("word"))
        // per-doc distinct vocab set in ONE exchange, materialized once —
        // the former distinct + three-way reuse (ca, both self-join sides)
        // re-exploded the corpus behind each consumer; pair counts expand
        // basket-locally (≤ C(40,2) per doc, map-side partial aggregation)
        val docsets = words.join(broadcast(vocab), "word")
          .groupBy(col("doc_id")).agg(collect_set(col("word")).as("ws"))
          .localCheckpoint()
        val ca = docsets.select(explode(col("ws")).as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("c"))
        val nDocs = Tables(s, dir, "documents").count()
        val pairs = graft.operators.BasketPairs.explodePairsDistinct(docsets, "ws")
          .groupBy(col("p1").as("w1"), col("p2").as("w2"))
          .agg(count(lit(1)).as("c_ab"))
          .filter(col("c_ab") >= 5)
        pairs
          .join(broadcast(ca.withColumnRenamed("word", "w1").withColumnRenamed("c", "c_a")), "w1")
          .join(broadcast(ca.withColumnRenamed("word", "w2").withColumnRenamed("c", "c_b")), "w2")
          .select(col("w1"), col("w2"), col("c_ab"),
            round(log(col("c_ab").cast("double") * lit(nDocs.toDouble)
              / (col("c_a").cast("double") * col("c_b").cast("double"))), 6).as("pmi"))
          .orderBy(col("pmi").desc, col("w1"), col("w2"))
          .limit(20)
      },
      Some("""WITH words AS (
        |  SELECT doc_id, word
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE word <> ''),
        |vocab AS (
        |  SELECT word FROM (
        |    SELECT word, COUNT(*) AS n FROM words GROUP BY word
        |    ORDER BY n DESC, word LIMIT 40)),
        |dt AS (
        |  SELECT DISTINCT doc_id, word FROM words
        |  WHERE word IN (SELECT word FROM vocab)),
        |ca AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c FROM dt GROUP BY word),
        |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        |pairs AS (
        |  SELECT x.word AS w1, y.word AS w2, CAST(COUNT(*) AS BIGINT) AS c_ab
        |  FROM dt x JOIN dt y ON x.doc_id = y.doc_id AND x.word < y.word
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 5)
        |SELECT w1, w2, c_ab,
        |  round(ln(CAST(c_ab AS DOUBLE) * CAST(n AS DOUBLE)
        |        / (CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE))), 6) AS pmi
        |FROM pairs, nd
        |JOIN ca a ON a.word = w1
        |JOIN ca b ON b.word = w2
        |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin)),

    // Character entropy per language — the information-density curation
    // signal (gibberish and boilerplate both move it): exact char counts
    // through the shuffle, then H = −Σ p·ln p folded over the per-language
    // char list in SORTED order on both engines, so the float sum order is
    // pinned (the alphabet is small; the corpus never re-flows through a
    // float).
    GraftQuery(
      "q192_char_entropy",
      (s, dir) => {
        val chars = Tables.spread(Tables(s, dir, "documents"), "doc_id")
          .select(col("lang"), explode(split(col("text"), "")).as("ch"))
          .filter(col("ch") =!= "")
          .groupBy(col("lang"), col("ch")).agg(count(lit(1)).as("n"))
        chars.groupBy(col("lang"))
          .agg(sum(col("n")).as("total"),
            count(lit(1)).as("n_chars_distinct"),
            expr("transform(array_sort(collect_list(struct(ch, n))), s -> s.n)")
              .as("ns"))
          .select(col("lang"), col("total"), col("n_chars_distinct"),
            round(expr(
              """aggregate(ns, CAST(0.0 AS DOUBLE),
                 (acc, x) -> acc - (CAST(x AS DOUBLE) / CAST(total AS DOUBLE))
                   * ln(CAST(x AS DOUBLE) / CAST(total AS DOUBLE)))"""), 6)
              .as("entropy_nats"))
          .orderBy("lang")
      },
      Some("""WITH c AS (
        |  SELECT lang, ch, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM (SELECT lang, unnest(string_split_regex(text, '')) AS ch
        |        FROM documents)
        |  WHERE ch <> '' GROUP BY 1, 2),
        |g AS (
        |  SELECT lang, CAST(SUM(n) AS BIGINT) AS total,
        |    CAST(COUNT(*) AS BIGINT) AS n_chars_distinct,
        |    list(n ORDER BY ch) AS ns
        |  FROM c GROUP BY lang)
        |SELECT lang, total, n_chars_distinct,
        |  round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(ns, x -> CAST(x AS DOUBLE))),
        |    (acc, x) -> acc - (x / total) * ln(x / total)), 6) AS entropy_nats
        |FROM g ORDER BY lang""".stripMargin)),

    // Charset audit — the encoding/PII gate an ingestion front door runs:
    // per source, exact counts of characters outside printable ASCII and
    // of control characters, via regexp_replace length arithmetic
    // (identical regex class semantics both engines, probed). A corrupted
    // feed shows up here before it poisons tokenizers downstream.
    GraftQuery(
      "q196_charset_audit",
      (s, dir) => {
        Tables.spread(Tables(s, dir, "documents"), "doc_id")
          .select(col("source"),
            length(col("text")).cast("long").as("n"),
            (length(col("text")) -
              length(regexp_replace(col("text"), "[^ -~]", ""))).cast("long")
              .as("n_nonascii"),
            (length(col("text")) -
              length(regexp_replace(col("text"), "[\\x00-\\x1f]", ""))).cast("long")
              .as("n_control"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n")).as("n_chars"),
            sum(col("n_nonascii")).as("n_nonascii"),
            sum(col("n_control")).as("n_control"),
            round(sum(col("n_nonascii")).cast("double")
              / sum(col("n")).cast("double"), 6).as("nonascii_frac"))
          .orderBy("source")
      },
      Some("""WITH d AS (
        |  SELECT source, length(text) AS n,
        |    length(text) - length(regexp_replace(text, '[^ -~]', '', 'g'))
        |      AS n_nonascii,
        |    length(text) - length(regexp_replace(text, '[\x00-\x1f]', '', 'g'))
        |      AS n_control
        |  FROM documents)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n) AS BIGINT) AS n_chars,
        |  CAST(SUM(n_nonascii) AS BIGINT) AS n_nonascii,
        |  CAST(SUM(n_control) AS BIGINT) AS n_control,
        |  round(CAST(SUM(n_nonascii) AS DOUBLE) / SUM(n), 6) AS nonascii_frac
        |FROM d GROUP BY source ORDER BY source""".stripMargin)),

    // Language-mix diversity per source — q192's ordered-fold entropy over
    // each source's LANGUAGE shares (≤ a handful of terms, float order
    // pinned by sorting on lang): monolingual feeds score 0, balanced
    // multilingual feeds approach ln(n_langs). The mixture-drift metric a
    // multilingual curation plan monitors.
    GraftQuery(
      "q216_source_lang_diversity",
      (s, dir) => {
        val counts = Tables(s, dir, "documents")
          .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("n"))
        counts.groupBy(col("source"))
          .agg(sum(col("n")).as("total"),
            count(lit(1)).as("n_langs"),
            expr("transform(array_sort(collect_list(struct(lang, n))), s -> s.n)")
              .as("ns"))
          .select(col("source"), col("total").as("n_docs"), col("n_langs"),
            round(expr(
              """aggregate(ns, CAST(0.0 AS DOUBLE),
                 (acc, x) -> acc - (CAST(x AS DOUBLE) / CAST(total AS DOUBLE))
                   * ln(CAST(x AS DOUBLE) / CAST(total AS DOUBLE)))"""), 6)
              .as("lang_entropy_nats"))
          .orderBy("source")
      },
      Some("""WITH c AS (
        |  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1, 2),
        |g AS (
        |  SELECT source, CAST(SUM(n) AS BIGINT) AS total,
        |    CAST(COUNT(*) AS BIGINT) AS n_langs,
        |    list(n ORDER BY lang) AS ns
        |  FROM c GROUP BY source)
        |SELECT source, total AS n_docs, n_langs,
        |  round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(ns, x -> CAST(x AS DOUBLE))),
        |    (acc, x) -> acc - (x / total) * ln(x / total)), 6)
        |    AS lang_entropy_nats
        |FROM g ORDER BY source""".stripMargin)),

    // Zipf fit — the ln(freq)-on-ln(rank) OLS slope over the corpus
    // vocabulary (a healthy natural-language corpus slopes ≈ −1; scraped
    // boilerplate flattens it). Global frequency ranks come from
    // [[graft.operators.DistributedPrefixSum]] (descending count order —
    // no single-partition window over the vocabulary), both logs are
    // scaled to BIGINT micro-nats, and the slope comes from exact integer
    // moments (q233 discipline) — floats only in the final scalar.
    GraftQuery(
      "q240_zipf_slope",
      (s, dir) => {
        val freq = Tables.spread(Tables(s, dir, "documents"), "doc_id")
          .select(explode(expr("filter(split(lower(text), ' '), w -> w <> '')"))
            .as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("c"))
          .withColumn("negc", -col("c"))
        val ranked = graft.operators.DistributedPrefixSum
          .scan(freq, Seq("negc", "w"), Nil, idxName = "rank")
          .select(
            expr("CAST(round(ln(CAST(rank AS DOUBLE)) * 1000000) AS BIGINT)").as("a"),
            expr("CAST(round(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT)").as("b"))
        val m = ranked.agg(count(lit(1)).as("n"),
          sum(col("a")).as("sa"), sum(col("b")).as("sb"),
          sum(expr("(a * a) div 1000000000")).as("haa"),
          sum(expr("(a * a) % 1000000000")).as("laa"),
          sum(expr("(a * b) div 1000000000")).as("hab"),
          sum(expr("(a * b) % 1000000000")).as("lab"))
        def mom(h: String, l: String) = expr(
          s"CAST(CAST($h AS DECIMAL(38,0)) * 1000000000 + $l AS DOUBLE)")
        val n = col("n").cast("double")
        val sa = col("sa").cast("double")
        val sb = col("sb").cast("double")
        m.select(col("n").as("vocab_size"),
          round((n * mom("hab", "lab") - sa * sb)
            / (n * mom("haa", "laa") - sa * sa), 6).as("zipf_slope"))
      },
      Some("""WITH w AS (
        |  SELECT unnest(list_filter(string_split(lower(text), ' '),
        |    x -> x <> '')) AS w
        |  FROM documents),
        |freq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY 1),
        |ranked AS (
        |  SELECT CAST(round(ln(CAST(row_number() OVER (ORDER BY c DESC, w)
        |      AS DOUBLE)) * 1000000) AS BIGINT) AS a,
        |    CAST(round(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT) AS b
        |  FROM freq),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(a) AS DOUBLE) AS sa, CAST(SUM(b) AS DOUBLE) AS sb,
        |    CAST(SUM(CAST(a AS HUGEINT) * a) AS DOUBLE) AS saa,
        |    CAST(SUM(CAST(a AS HUGEINT) * b) AS DOUBLE) AS sab
        |  FROM ranked)
        |SELECT n AS vocab_size,
        |  round((CAST(n AS DOUBLE) * sab - sa * sb)
        |        / (CAST(n AS DOUBLE) * saa - sa * sa), 6) AS zipf_slope
        |FROM m""".stripMargin)),

    // Top tokens per language through the CUSTOM physical operator
    // [[graft.plans.TopKPerGroup]] (partial + final TopKPerGroupExec
    // around one exchange — k rows per group per task cross the shuffle,
    // never the full token table), here on STRING group keys — the fourth
    // key-type shape the operator serves. Oracle is the window-rank twin;
    // results must be bit-identical under the shared total order.
    GraftQuery(
      "q246_top_tokens_per_lang",
      (s, dir) => {
        val counts = Tables.spread(Tables(s, dir, "documents"), "doc_id")
          .select(col("lang"),
            explode(expr("filter(split(lower(text), ' '), w -> w <> '')")).as("w"))
          .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
        graft.plans.TopKPerGroup(counts, Seq("lang"),
            Seq(("c", false), ("w", true)), k = 5)
          .orderBy(col("lang"), col("c").desc, col("w").asc)
      },
      Some("""WITH t AS (
        |  SELECT lang, unnest(list_filter(string_split(lower(text), ' '),
        |    x -> x <> '')) AS w
        |  FROM documents),
        |c AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY 1, 2),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY c DESC, w) AS rnk
        |  FROM c)
        |SELECT lang, w, c FROM r WHERE rnk <= 5
        |ORDER BY lang, c DESC, w""".stripMargin)),

    // Cross-language vocabulary overlap — Jaccard similarity of the
    // DISTINCT token vocabularies per language pair: high overlap between
    // supposedly different languages is the language-ID-contamination
    // smell a multilingual curation plan checks first. One distinct
    // (lang, token) frame; pair intersections via a token self-join at
    // the VOCABULARY level (never row-level text); union by |A|+|B|−|A∩B|.
    GraftQuery(
      "q259_vocab_overlap",
      (s, dir) => {
        val vocab = Tables.spread(Tables(s, dir, "documents"), "doc_id")
          .select(col("lang"),
            explode(expr("filter(split(lower(text), ' '), w -> w <> '')")).as("w"))
          .distinct()
          .localCheckpoint()
        val sizes = vocab.groupBy(col("lang")).agg(count(lit(1)).as("n"))
        val inter = vocab.select(col("lang").as("l1"), col("w"))
          .join(vocab.select(col("lang").as("l2"), col("w")), Seq("w"))
          .filter(col("l1") < col("l2"))
          .groupBy(col("l1"), col("l2")).agg(count(lit(1)).as("inter"))
        inter
          .join(broadcast(sizes.select(col("lang").as("l1"), col("n").as("n1"))), "l1")
          .join(broadcast(sizes.select(col("lang").as("l2"), col("n").as("n2"))), "l2")
          .select(col("l1"), col("l2"), col("n1"), col("n2"), col("inter"),
            round(col("inter").cast("double")
              / (col("n1") + col("n2") - col("inter")).cast("double"), 6)
              .as("jaccard"))
          .orderBy("l1", "l2")
      },
      Some("""WITH v AS (
        |  SELECT DISTINCT lang, unnest(list_filter(string_split(lower(text), ' '),
        |    x -> x <> '')) AS w
        |  FROM documents),
        |sz AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY 1),
        |i AS (
        |  SELECT a.lang AS l1, b.lang AS l2, CAST(COUNT(*) AS BIGINT) AS inter
        |  FROM v a JOIN v b ON a.w = b.w AND a.lang < b.lang
        |  GROUP BY 1, 2)
        |SELECT l1, l2, s1.n AS n1, s2.n AS n2, inter,
        |  round(CAST(inter AS DOUBLE) / CAST(s1.n + s2.n - inter AS DOUBLE), 6)
        |    AS jaccard
        |FROM i JOIN sz s1 ON i.l1 = s1.lang JOIN sz s2 ON i.l2 = s2.lang
        |ORDER BY l1, l2""".stripMargin)),

    // Hapax legomena rate per source — the share of vocabulary appearing
    // exactly once, the classic corpus-health number (natural text runs
    // ~40–60%; templated or deduplicated-to-death corpora collapse it).
    // One token aggregate per (source, token), one rollup; exact counts,
    // final-float shares.
    GraftQuery(
      "q274_hapax_rate",
      (s, dir) => {
        val tf = Tables.spread(Tables(s, dir, "documents"), "doc_id")
          .select(col("source"),
            explode(expr("filter(split(lower(text), ' '), w -> w <> '')")).as("w"))
          .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
        tf.groupBy(col("source"))
          .agg(count(lit(1)).as("vocab"),
            sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax"),
            sum(col("c")).as("tokens"))
          .select(col("source"), col("tokens"), col("vocab"), col("hapax"),
            round(col("hapax").cast("double") / col("vocab").cast("double"), 6)
              .as("hapax_share"))
          .orderBy("source")
      },
      Some("""WITH t AS (
        |  SELECT source, unnest(list_filter(string_split(lower(text), ' '),
        |    x -> x <> '')) AS w
        |  FROM documents),
        |tf AS (
        |  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY 1, 2)
        |SELECT source, CAST(SUM(c) AS BIGINT) AS tokens,
        |  CAST(COUNT(*) AS BIGINT) AS vocab,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
        |  round(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |        / COUNT(*), 6) AS hapax_share
        |FROM tf GROUP BY source ORDER BY source""".stripMargin))
  )
}
