package graft.queries

import graft.{GraftQuery, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators beyond the q65/q73/q78 set: deterministic
  * corpus shuffling, greedy sequence packing, PII scrubbing, and per-domain
  * quota sampling — the remaining data-ordering/safety shapes a 100 TB
  * pretraining pipeline runs between dedup and tokenization.
  *
  * Scale notes (per query):
  *   - q87: a content-addressed shuffle key (`md5(seed || id)`) makes the
  *     global ORDER BY a range-partitioned sort — Spark samples split points
  *     and every executor sorts one key range; uniform hex keys mean no hot
  *     ranges, and re-running with the same seed is bit-reproducible.
  *   - q88: packing cumsum is a per-source window — one shuffle on source,
  *     each partition streamed once. A single giant source serializes into
  *     one task; shard the partition key hierarchically (source, shard) with
  *     per-shard budgets when a source exceeds executor memory.
  *   - q89: pure per-row regex projection + one aggregation — embarrassingly
  *     parallel, no shuffle before the final partial+final agg.
  *   - q90: quota-by-rank per source; the window phrasing here is the oracle
  *     twin, the bounded-heap scale path is [[graft.functions.TopKAgg]]
  *     (shuffle carries k rows per group per task, q76).
  */
object Curation extends QueryPack {

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\b555-\\d{4}\\b"
  private val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def queries: Seq[GraftQuery] = Seq(

    // Deterministic global shuffle: the reproducible "random" order a
    // training run reads the corpus in. Key is content-addressed from a
    // seed + doc_id so re-runs (and the oracle) agree bit-for-bit.
    GraftQuery(
      "q87_shuffle_deterministic",
      (s, dir) => {
        Tables(s, dir, "documents")
          .select(col("doc_id"),
            md5(concat(lit("seed42:"), col("doc_id").cast("string"))).as("shuffle_key"))
          .orderBy("shuffle_key", "doc_id")
      },
      Some("""SELECT doc_id, md5('seed42:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
        |FROM documents ORDER BY shuffle_key, doc_id""".stripMargin)),

    // Greedy sequence packing: walk each source in deterministic-shuffle
    // order, cut a new pack when the running token total passes the budget
    // (pack = floor(tokens-before-me / budget)), report per-pack fill.
    GraftQuery(
      "q88_sequence_packing",
      (s, dir) => {
        val budget = 512.0
        val d = Tables(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"),
            md5(concat(lit("pack:"), col("doc_id").cast("string"))).as("skey"))
        val w = Window.partitionBy(col("source")).orderBy(col("skey"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        d.withColumn("cum", sum(col("n_tokens")).over(w))
          .withColumn("pack_id",
            floor((col("cum") - col("n_tokens")) / lit(budget)).cast("long"))
          .groupBy(col("source"), col("pack_id"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"))
          .orderBy("source", "pack_id")
      },
      Some("""WITH d AS (
        |  SELECT source, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    md5('pack:' || CAST(doc_id AS VARCHAR)) AS skey
        |  FROM documents),
        |c AS (
        |  SELECT source, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY skey, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d)
        |SELECT source, CAST(FLOOR((cum - n_tokens) / 512.0) AS BIGINT) AS pack_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
        |FROM c GROUP BY source, pack_id ORDER BY source, pack_id""".stripMargin)),

    // PII scrub: inject one known email/phone/IP per doc (the synthetic
    // corpus has none), redact all three patterns, and prove per source that
    // every injected item was found, nothing survives re-scanning the
    // scrubbed text, and the byte delta matches. At 100 TB this is the
    // no-shuffle projection pass every release pipeline runs.
    GraftQuery(
      "q89_pii_scrub",
      (s, dir) => {
        val aug = Tables(s, dir, "documents")
          .select(col("source"), concat(col("text"),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com or 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
            lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
            lit("."), (col("doc_id") % 100).cast("string")).as("t"))
        val red = aug.select(col("source"), col("t"),
          regexp_count(col("t"), lit(EmailRe)).as("n_email"),
          regexp_count(col("t"), lit(PhoneRe)).as("n_phone"),
          regexp_count(col("t"), lit(IpRe)).as("n_ip"),
          regexp_replace(regexp_replace(regexp_replace(col("t"),
            EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>"), IpRe, "<IP>").as("clean"))
        red.groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_email")).as("emails_redacted"),
            sum(col("n_phone")).as("phones_redacted"),
            sum(col("n_ip")).as("ips_redacted"),
            sum(regexp_count(col("clean"), lit(EmailRe)) +
              regexp_count(col("clean"), lit(PhoneRe)) +
              regexp_count(col("clean"), lit(IpRe))).as("residual"),
            sum(length(col("t")) - length(col("clean"))).as("chars_removed"))
          .orderBy("source")
      },
      Some("""WITH aug AS (
        |  SELECT source, text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |    '@example.com or 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
        |    ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR) AS t
        |  FROM documents),
        |red AS (
        |  SELECT source, t,
        |    len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |    len(regexp_extract_all(t, '\b555-\d{4}\b')) AS n_phone,
        |    len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
        |    regexp_replace(regexp_replace(regexp_replace(t,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b555-\d{4}\b', '<PHONE>', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS clean
        |  FROM aug)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_email) AS BIGINT) AS emails_redacted,
        |  CAST(SUM(n_phone) AS BIGINT) AS phones_redacted,
        |  CAST(SUM(n_ip) AS BIGINT) AS ips_redacted,
        |  CAST(SUM(len(regexp_extract_all(clean, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |    + len(regexp_extract_all(clean, '\b555-\d{4}\b'))
        |    + len(regexp_extract_all(clean, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))) AS BIGINT) AS residual,
        |  CAST(SUM(length(t) - length(clean)) AS BIGINT) AS chars_removed
        |FROM red GROUP BY source ORDER BY source""".stripMargin)),

    // Per-domain quota: keep the 10 deterministically-"random" docs per
    // source (md5 order = seeded uniform draw), report what survived.
    GraftQuery(
      "q90_domain_quota",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"),
            md5(concat(lit("quota:"), col("doc_id").cast("string"))).as("skey"))
        val w = Window.partitionBy(col("source")).orderBy(col("skey"), col("doc_id"))
        d.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_kept"),
            sum(col("n_tokens")).as("kept_tokens"),
            min(col("skey")).as("first_key"),
            max(col("skey")).as("last_key"))
          .orderBy("source")
      },
      Some("""WITH d AS (
        |  SELECT source, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    md5('quota:' || CAST(doc_id AS VARCHAR)) AS skey
        |  FROM documents),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY skey, doc_id) AS rn FROM d)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens,
        |  min(skey) AS first_key, max(skey) AS last_key
        |FROM r WHERE rn <= 10 GROUP BY source ORDER BY source""".stripMargin)),

    // Curriculum deciles: per-language NTILE(10) over (length, doc_id) — the
    // shortest-to-longest schedule a curriculum-learning loader consumes.
    // The tile boundary semantics (earlier tiles get the remainder rows) are
    // identical in Spark and DuckDB, and the total order makes assignment
    // deterministic; the per-decile manifest is what the loader reads.
    GraftQuery(
      "q151_curriculum_deciles",
      (s, dir) => {
        val w = Window.partitionBy("lang").orderBy(col("n_chars").asc, col("doc_id").asc)
        Tables(s, dir, "documents")
          .withColumn("decile", ntile(10).over(w).cast("long"))
          .groupBy(col("lang"), col("decile"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"),
            sum(col("n_chars")).as("decile_chars"))
          .orderBy("lang", "decile")
      },
      Some("""WITH d AS (
        |  SELECT lang, doc_id, n_chars,
        |    CAST(ntile(10) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS BIGINT)
        |      AS decile
        |  FROM documents)
        |SELECT lang, decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        |  CAST(SUM(n_chars) AS BIGINT) AS decile_chars
        |FROM d GROUP BY lang, decile ORDER BY lang, decile""".stripMargin)),

    // Curation funnel — the per-source survival report every C4/RefinedWeb-
    // style pipeline publishes: raw docs → length gate (≥ 100 chars) →
    // exact dedup (first doc_id per md5(text) wins) → repetition gate
    // (most frequent space-token < 30% of tokens). Stages are CUMULATIVE
    // and every count is exact; the whole funnel is one scan plus a
    // dedup-rank window. Survival rate is the only float.
    GraftQuery(
      "q175_curation_funnel",
      (s, dir) => {
        val staged = Tables.spread(Tables(s, dir, "documents"), "doc_id")
          .withColumn("len_ok", (col("n_chars") >= 100).cast("int").cast("long"))
          .withColumn("dup_rank", row_number().over(
            Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
          .withColumn("toks", split(col("text"), " "))
          .withColumn("n_toks", expr("size(filter(toks, t -> t <> ''))"))
          .withColumn("top_tok", expr(
            """array_max(transform(array_distinct(filter(toks, t -> t <> '')),
               t -> size(filter(toks, x -> x = t))))"""))
          .withColumn("rep_ok",
            (col("top_tok") * 100 < col("n_toks") * 30).cast("int").cast("long"))
        staged.groupBy(col("source"))
          .agg(count(lit(1)).as("n_raw"),
            sum(col("len_ok")).as("n_len"),
            sum(when(col("len_ok") === 1 && col("dup_rank") === 1, 1L)
              .otherwise(0L)).as("n_dedup"),
            sum(when(col("len_ok") === 1 && col("dup_rank") === 1
              && col("rep_ok") === 1, 1L).otherwise(0L)).as("n_final"))
          .withColumn("survival",
            round(col("n_final").cast("double") / col("n_raw").cast("double"), 6))
          .orderBy("source")
      },
      Some("""WITH d AS (
        |  SELECT source, doc_id, n_chars, text,
        |    CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END AS len_ok,
        |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS dup_rank,
        |    len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_toks,
        |    list_max(list_transform(
        |      list_distinct(list_filter(string_split(text, ' '), t -> t <> '')),
        |      t -> len(list_filter(string_split(text, ' '), x -> x = t)))) AS top_tok
        |  FROM documents)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_raw,
        |  CAST(SUM(len_ok) AS BIGINT) AS n_len,
        |  CAST(SUM(CASE WHEN len_ok = 1 AND dup_rank = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dedup,
        |  CAST(SUM(CASE WHEN len_ok = 1 AND dup_rank = 1
        |       AND top_tok * 100 < n_toks * 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
        |  round(CAST(SUM(CASE WHEN len_ok = 1 AND dup_rank = 1
        |       AND top_tok * 100 < n_toks * 30 THEN 1 ELSE 0 END) AS DOUBLE)
        |      / COUNT(*), 6) AS survival
        |FROM d GROUP BY source ORDER BY source""".stripMargin)),

    // Rank-normalize a feature per group — percent_rank is the exact
    // rational (rank−1)/(n−1), so the transform is deterministic given the
    // total order; summarized per (lang, quartile-of-rank) so the output
    // stays bounded. The distribution-free feature scaling ML prep uses
    // when magnitudes drift across groups.
    GraftQuery(
      "q183_rank_normalize",
      (s, dir) => {
        val w = Window.partitionBy("lang").orderBy(col("n_chars").asc, col("doc_id").asc)
        Tables(s, dir, "documents")
          .withColumn("pr", percent_rank().over(w))
          .withColumn("quartile", least(floor(col("pr") * 4) + 1, lit(4)).cast("long"))
          .groupBy(col("lang"), col("quartile"))
          .agg(count(lit(1)).as("n_docs"),
            round(min(col("pr")), 6).as("min_pr"),
            round(max(col("pr")), 6).as("max_pr"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"))
          .orderBy("lang", "quartile")
      },
      Some("""WITH p AS (
        |  SELECT lang, doc_id, n_chars,
        |    percent_rank() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS pr
        |  FROM documents)
        |SELECT lang, CAST(least(floor(pr * 4) + 1, 4) AS BIGINT) AS quartile,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  round(MIN(pr), 6) AS min_pr, round(MAX(pr), 6) AS max_pr,
        |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
        |FROM p GROUP BY 1, 2 ORDER BY lang, quartile""".stripMargin)),

    // Largest-remainder apportionment — EXACT-size stratified allocation:
    // distribute a 1000-doc budget across sources proportionally, floors
    // first, then the k largest fractional remainders (tie → source asc)
    // get +1. Pure integer arithmetic start to finish — the allocator
    // behind "sample exactly N with source proportions preserved".
    GraftQuery(
      "q185_largest_remainder",
      (s, dir) => {
        val budget = 1000L
        val counts = Tables(s, dir, "documents")
          .groupBy(col("source")).agg(count(lit(1)).as("n"))
        val total = counts.agg(sum(col("n")).as("total"))
        val based = counts.crossJoin(broadcast(total))
          .withColumn("base", expr(s"(n * $budget) div total"))
          .withColumn("rem", expr(s"(n * $budget) % total"))
        val w = Window.orderBy(col("rem").desc, col("source"))
        val deficit = based
          .withColumn("short", expr(s"$budget") - sum(col("base")).over(Window.partitionBy()))
          .withColumn("rrank", row_number().over(w).cast("long"))
        deficit
          .withColumn("alloc",
            col("base") + when(col("rrank") <= col("short"), 1L).otherwise(0L))
          .select(col("source"), col("n"), col("base"), col("rem"), col("alloc"))
          .orderBy("source")
      },
      Some("""WITH c AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY 1),
        |t AS (SELECT SUM(n) AS total FROM c),
        |b AS (
        |  SELECT source, n, (n * 1000) // total AS base, (n * 1000) % total AS rem
        |  FROM c, t),
        |d AS (
        |  SELECT *, 1000 - SUM(base) OVER () AS short,
        |    CAST(row_number() OVER (ORDER BY rem DESC, source) AS BIGINT) AS rrank
        |  FROM b)
        |SELECT source, n, CAST(base AS BIGINT) AS base, CAST(rem AS BIGINT) AS rem,
        |  CAST(base + CASE WHEN rrank <= short THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM d ORDER BY source""".stripMargin)),

    // Split-leakage audit — the gate that catches q73's id-hash split
    // assignment leaking IDENTICAL CONTENT across train/val/test (distinct
    // doc ids, same text): content sha256 grouped to (hash → distinct
    // splits present), rolled up by how many splits each duplicate set
    // touches. Any row with splits_present > 1 is evaluation contamination
    // (the q75 decontamination concern applied to our OWN splits). Two
    // hash aggregates; the only wide column (text) dies at the first
    // projection.
    GraftQuery(
      "q245_split_leakage",
      (s, dir) => {
        val hexpos = graft.queries.hexDigitVal _
        val h = md5(col("doc_id").cast("string"))
        val assigned = Tables(s, dir, "documents")
          .withColumn("bucket",
            (hexpos(substring(h, 1, 1)) * 16 + hexpos(substring(h, 2, 1))).cast("long"))
          .withColumn("split",
            when(col("bucket") < 205, "train")
              .when(col("bucket") < 230, "val")
              .otherwise("test"))
          .select(sha2(col("text"), 256).as("ch"), col("split"))
        assigned
          .groupBy(col("ch"))
          .agg(countDistinct(col("split")).as("splits_present"),
            count(lit(1)).as("n_docs"))
          .groupBy(col("splits_present"))
          .agg(count(lit(1)).as("n_content_hashes"), sum(col("n_docs")).as("n_docs"))
          .orderBy("splits_present")
      },
      Some("""WITH b AS (
        |  SELECT sha256(text) AS ch,
        |    CASE WHEN (instr('0123456789abcdef',
        |            substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 +
        |          (instr('0123456789abcdef',
        |            substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) < 205
        |      THEN 'train'
        |      WHEN (instr('0123456789abcdef',
        |            substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 +
        |          (instr('0123456789abcdef',
        |            substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) < 230
        |      THEN 'val' ELSE 'test' END AS split
        |  FROM documents),
        |g AS (
        |  SELECT ch, CAST(COUNT(DISTINCT split) AS BIGINT) AS splits_present,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM b GROUP BY ch)
        |SELECT splits_present,
        |  CAST(COUNT(*) AS BIGINT) AS n_content_hashes,
        |  CAST(SUM(n_docs) AS BIGINT) AS n_docs
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
