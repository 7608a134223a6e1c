package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join with prefix filtering — the published
  * AllPairs/PPJoin pruning (Bayardo, Ma & Srikant, WWW'07; Xiao et al.,
  * WWW'08): order tokens globally by ascending frequency; a doc of n tokens
  * keeps only its `n - ceil(t·n) + 1` rarest as its *prefix*; any pair with
  * Jaccard ≥ t MUST share a prefix token (intersection ≥ ceil(t·max(n1,n2))
  * pigeonholes into the prefixes), so candidate generation joins prefixes
  * instead of full token sets. At t = 0.8 the prefix is ~20% of each doc and
  * — because prefixes hold the RAREST tokens — join groups are tiny, where a
  * full-token join explodes on stopword-grade shingles. Candidates then pass
  * a length filter (t·n1 ≤ n2 ≤ n1/t, necessary for J ≥ t) and are verified
  * with the true intersection — results are EXACT, identical to the naive
  * self-join.
  *
  * Scale shape: two token-shuffles (global frequency, per-doc rank), one
  * prefix self-join (small, rare-token groups), one verify join against
  * collected token arrays. No broadcast, no O(n²) pair space.
  */
object PrefixFilterJoin {

  /** All pairs (d1 < d2) with token-set Jaccard ≥ threshold:
    * (d1, d2, inter, jaccard). `tokens` must be (docId, token) rows;
    * duplicates are collapsed (set semantics, like the naive join).
    *
    * The whole per-doc state — token count, rarity-ordered token array, and
    * its prefix slice — is built in ONE aggregation (global rarity order is
    * the (df, tok) pair itself, so no global row_number, and the in-array
    * `sort_array`/`slice` replace a per-doc window pass). That table is the
    * only multiply-read intermediate; `persist` (default true) caches it
    * MEMORY_AND_DISK so candidate generation and both verify sides reuse it
    * instead of re-exploding the corpus.
    */
  def jaccardPairs(tokens: DataFrame, docIdCol: String, tokenCol: String,
      threshold: Double, persist: Boolean = true): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val toks = tokens
      .select(col(docIdCol).as("doc"), col(tokenCol).as("tok")).distinct()
    // ascending document frequency, token as tiebreak — one consistent
    // TOTAL order, which is all the prefix theorem needs. df comes from a
    // whole-partition window on the tok shuffle (no second agg + join pass).
    val withDf = toks.withColumn("df",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("tok"))))
    // per-doc state in one shuffle: n, tokens rarest-first, prefix =
    // the (n - ceil(t·n) + 1) rarest
    val docSets = withDf
      .groupBy(col("doc"))
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("ordered"))
      .select(col("doc"),
        size(col("ordered")).cast("long").as("n"),
        expr("transform(ordered, x -> x.tok)").as("toks"))
      .withColumn("prefix", expr(
        s"slice(toks, 1, cast(size(toks) - ceil($threshold * size(toks)) + 1 AS INT))"))
    val cachedSets =
      if (persist) docSets.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else docSets
    // materialize the cache EAGERLY: the candidate and verify stages are
    // independent AQE stage-jobs that run CONCURRENTLY, and a lazily-
    // materializing InMemoryRelation lets them race — each racer recomputes
    // the corpus scan + shingle explode + frequency window instead of
    // hitting blocks (observed: the corpus parquet read 6x in one q72run).
    // One tiny count pins the blocks before any consumer launches.
    if (persist) cachedSets.count()

    // candidates: share ≥1 prefix token, mutual length bound for J ≥ t, and
    // the PPJoin positional bound — a token at (0-based) position p in the
    // rarity order leaves at most n - p common tokens at or after it, so
    // overlap ≤ min(n1-p1, n2-p2); J ≥ t forces overlap ≥
    // ceil(t/(1+t)·(n1+n2)), and a pair none of whose shared prefix tokens
    // can witness that bound is pruned before the verify join ever sees it
    val pref = cachedSets.select(col("doc"), col("n"),
      posexplode(col("prefix")).as(Seq("pos", "tok")))
    // required overlap: J ≥ t ⇔ I ≥ t/(1+t)·(n1+n2); ε guards the FP
    // product from over-pruning an exact-boundary pair (over-keeping is
    // harmless — the verify below is exact)
    val alpha = lit(threshold / (1.0 + threshold)) * (col("n1") + col("n2")) - lit(1e-9)
    val cands = pref.select(col("doc").as("d1"), col("n").as("n1"), col("pos").as("p1"), col("tok"))
      .join(pref.select(col("doc").as("d2"), col("n").as("n2"), col("pos").as("p2"), col("tok")),
        Seq("tok"))
      .filter(col("d1") < col("d2") &&
        col("n2") >= lit(threshold) * col("n1") &&
        col("n1") >= lit(threshold) * col("n2"))
      .groupBy(col("d1"), col("d2"), col("n1"), col("n2"))
      .agg(max(least(col("n1") - col("p1"), col("n2") - col("p2"))).as("ubound"))
      .filter(col("ubound") >= alpha)
      .select(col("d1"), col("d2"), col("n1"), col("n2"))

    // verify: true intersection against the full token arrays
    // (array_intersect hashes — order is irrelevant)
    val out = cands
      .join(cachedSets.select(col("doc").as("d1"), col("toks").as("t1")), Seq("d1"))
      .join(cachedSets.select(col("doc").as("d2"), col("toks").as("t2")), Seq("d2"))
      .withColumn("inter", size(array_intersect(col("t1"), col("t2"))).cast("long"))
      .withColumn("jaccard", col("inter") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("inter"), col("jaccard"))
    if (persist) {
      // materialize the (near-dup pairs ≪ corpus) result eagerly, then
      // release the per-doc cache — a lazy return would pin the widest
      // intermediate in the block manager for the rest of the session
      val result = out.localCheckpoint()
      cachedSets.unpersist()
      result
    } else out
  }

  /** Word-3-shingle convenience over a text column, matching q39's
    * shingling, for docs with ≥ 3 words.
    */
  def shinglePairs(docs: DataFrame, docIdCol: String, textCol: String,
      threshold: Double): DataFrame = {
    // a small input (one parquet row group) plans as one partition, which
    // would single-thread the explode fan-out below; spread it first (no-op
    // at scale — see Tables.spread)
    val ws = graft.Tables.spread(docs, docIdCol)
      .select(col(docIdCol).as("doc"), split(col(textCol), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
    val sh = ws.select(col("doc"), explode(expr(
      "transform(sequence(0, size(ws) - 3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"))
      .as("shingle"))
    jaccardPairs(sh, "doc", "shingle", threshold)
  }
}
