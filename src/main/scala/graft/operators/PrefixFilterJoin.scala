package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
    * `persist` (default true) caches the two multiply-referenced
    * intermediates — the distinct token table (read 6×: frequency, doc
    * sizes, both prefix sides, both verify sides) and the prefix table
    * (both candidate sides) — as MEMORY_AND_DISK, turning six scan+explode
    * passes into one. Disable for one-shot runs where recompute is cheaper
    * than executor disk.
    */
  def jaccardPairs(tokens: DataFrame, docIdCol: String, tokenCol: String,
      threshold: Double, persist: Boolean = true): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    def cached(df: DataFrame): DataFrame =
      if (persist) df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) else df
    val toks = cached(tokens
      .select(col(docIdCol).as("doc"), col(tokenCol).as("tok")).distinct())
    val nTok = toks.groupBy(col("doc")).agg(count(lit(1)).as("n"))

    // global rarity order: ascending document frequency, token as tiebreak.
    // The theorem needs any one consistent TOTAL order — the (df, tok) pair
    // itself is one, so no global row_number (which would funnel every
    // distinct token through a single-partition sort at scale)
    val ranked = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))

    // prefix = the (n - ceil(t·n) + 1) rarest tokens of each doc
    val perDocW = Window.partitionBy(col("doc")).orderBy(col("df"), col("tok"))
    val prefixes = cached(toks
      .join(ranked, Seq("tok"))
      .withColumn("pos", row_number().over(perDocW))
      .join(nTok, Seq("doc"))
      .filter(col("pos") <= col("n") - ceil(lit(threshold) * col("n")) + 1)
      .select(col("doc"), col("tok"), col("n")))

    // candidates: share ≥1 prefix token + mutual length bound for J ≥ t
    val cands = prefixes.toDF("d1", "tok", "n1")
      .join(prefixes.toDF("d2", "tok", "n2"), Seq("tok"))
      .filter(col("d1") < col("d2") &&
        col("n2") >= lit(threshold) * col("n1") &&
        col("n1") >= lit(threshold) * col("n2"))
      .select(col("d1"), col("d2"), col("n1"), col("n2"))
      .distinct()

    // verify: true intersection against the full (sorted) token arrays
    val sets = toks.groupBy(col("doc"))
      .agg(array_sort(collect_list(col("tok"))).as("toks"))
    cands
      .join(sets.select(col("doc").as("d1"), col("toks").as("t1")), Seq("d1"))
      .join(sets.select(col("doc").as("d2"), col("toks").as("t2")), Seq("d2"))
      .withColumn("inter", size(array_intersect(col("t1"), col("t2"))).cast("long"))
      .withColumn("jaccard", col("inter") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("inter"), col("jaccard"))
  }

  /** Word-3-shingle convenience over a text column, matching q39's
    * shingling, for docs with ≥ 3 words.
    */
  def shinglePairs(docs: DataFrame, docIdCol: String, textCol: String,
      threshold: Double): DataFrame = {
    val ws = docs
      .select(col(docIdCol).as("doc"), split(col(textCol), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
    val sh = ws.select(col("doc"), explode(expr(
      "transform(sequence(0, size(ws) - 3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"))
      .as("shingle"))
    jaccardPairs(sh, "doc", "shingle", threshold)
  }
}
