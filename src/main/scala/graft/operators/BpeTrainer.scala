package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed BPE (byte-pair-encoding) tokenizer training — the vocabulary
  * a pretraining pipeline learns over its corpus before tokenizing it.
  *
  * Standard two-stage shape (what every published BPE trainer does, scaled to
  * Spark):
  *   1. CORPUS → WORD COUNTS: one distributed `groupBy(word).count()` —
  *      the only pass that touches the 100 TB corpus.
  *   2. MERGE LOOP over the weighted vocab table (orders of magnitude
  *      smaller, but kept distributed here — at web scale the distinct-word
  *      table is itself billions of rows): each iteration
  *        - explodes adjacent symbol pairs with word weights,
  *        - aggregates pair frequencies (partial+final, one shuffle of
  *          pair partials),
  *        - takes the single best pair via `orderBy(...).limit(1)`
  *          (TakeOrderedAndProject — a one-row collect, never the table),
  *        - rewrites the symbol arrays with a per-row left-to-right scan
  *          (typed `map` — genuinely imperative per-row logic, the
  *          mapPartitions tier of SURVEY.md §7.3).
  *      The rewritten vocab is persisted and the previous iteration released,
  *      so iteration i+1 reads a materialized table instead of replaying the
  *      whole lineage.
  *
  * Determinism: pair frequencies are exact long sums; the best pair breaks
  * frequency ties lexicographically on (left, right) — reruns give the same
  * merge table bit-for-bit.
  */
object BpeTrainer {

  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** Replace every non-overlapping adjacent (l, r) occurrence, scanning
    * left-to-right — the classic BPE apply step.
    */
  private[operators] def mergePair(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else {
        out += syms(i); i += 1
      }
    }
    out.result()
  }

  /** Tokenize one word with a trained merge table: start from characters,
    * apply merges in rank order (the classic greedy BPE encode — each
    * learned merge rewrites all its non-overlapping occurrences before the
    * next rank applies). Deterministic for a fixed merge table.
    */
  def encode(word: String, ranked: Seq[(String, String)]): Seq[String] = {
    // same symbolization as training: characters plus the </w> end marker
    var syms: Seq[String] = word.map(_.toString) :+ "</w>"
    ranked.foreach { case (l, r) =>
      if (syms.length > 1) syms = mergePair(syms, l, r)
    }
    syms
  }

  /** Train `nMerges` merges over a weighted vocab of (word, weight).
    *
    * The merge loop runs in one of two modes, chosen by vocab size:
    *   - vocab ≤ `collectThreshold` distinct words: collect the (tiny) vocab
    *     and loop driver-side — what every published BPE trainer does, since
    *     the weighted vocab is orders of magnitude smaller than the corpus
    *     and each distributed iteration would pay whole-job latency to scan
    *     a few thousand rows;
    *   - larger: the fully distributed loop (one pair-agg shuffle + one-row
    *     TakeOrdered collect per merge) for web-scale vocabs that don't fit
    *     one machine.
    * Both paths share `mergePair` and the (freq desc, left, right) tie-break,
    * so they produce the identical merge table (pinned in BpeTrainerSpec).
    *
    * @param words   frame with a string word column and a long weight column
    * @param minFreq stop early when the best pair's frequency drops below
    *                this (2 by default: a pair seen once is noise)
    */
  def train(words: DataFrame, wordCol: String, weightCol: String,
      nMerges: Int, minFreq: Long = 2L, collectThreshold: Long = 100000L): Seq[Merge] = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    val spark = words.sparkSession
    import spark.implicits._

    val typed = words.select(col(wordCol).cast("string"), col(weightCol).cast("long"))
      .as[(String, Long)]
    // one action decides the mode AND supplies the local-path data: probe one
    // row past the threshold; an overflowing probe falls through to the
    // distributed loop (a separate count() + collect() would run the
    // upstream corpus-wide word-count aggregation twice)
    val cap = math.min(collectThreshold, (Int.MaxValue - 1).toLong).toInt
    val probe = typed.limit(cap + 1).collect()
    if (probe.length <= cap)
      return trainLocal(probe, nMerges, minFreq)

    // word → its character symbols; </w> marks the word boundary so merges
    // cannot cross words when the vocab is later applied to running text
    var vocab: Dataset[(Seq[String], Long)] = typed
      .map { case (w, n) => ((w.map(_.toString) :+ "</w>"): Seq[String], n) }
      .persist(StorageLevel.MEMORY_AND_DISK)

    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      // adjacent-pair frequencies: one explode + one partial+final agg.
      // Fully-merged words (one symbol left) have no pairs — and Spark's
      // sequence(0, -1) would run DESCENDING, so they must be filtered out.
      val best = vocab.toDF("syms", "w")
        .filter(size(col("syms")) >= 2)
        .select(col("w"), explode(expr(
          "transform(sequence(0, size(syms) - 2), i -> struct(syms[i] AS l, syms[i+1] AS r))"))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("w")).as("freq"))
        .orderBy(col("freq").desc, col("l"), col("r"))
        .limit(1)
        .collect()

      best.headOption.filter(_.getLong(2) >= minFreq) match {
        case Some(row) =>
          val (l, r, f) = (row.getString(0), row.getString(1), row.getLong(2))
          merges += Merge(rank, l, r, f)
          val prev = vocab
          vocab = prev.map { case (syms, n) => (mergePair(syms, l, r), n) }
            .persist(StorageLevel.MEMORY_AND_DISK)
          vocab.count() // materialize before releasing the parent
          prev.unpersist()
          rank += 1
        case None => done = true
      }
    }
    vocab.unpersist()
    merges.result()
  }

  /** Unsigned byte-wise UTF-8 comparison — the order Spark's UTF8String
    * uses, so local and distributed tie-breaks agree beyond the BMP.
    */
  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Driver-side merge loop over a collected vocab — bit-identical to the
    * distributed loop (same mergePair, same tie-break), minus the per-merge
    * job latency.
    */
  private def trainLocal(words: Array[(String, Long)],
      nMerges: Int, minFreq: Long): Seq[Merge] = {
    var vocab: Array[(Seq[String], Long)] =
      words.map { case (w, n) => ((w.map(_.toString) :+ "</w>"): Seq[String], n) }
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val freqs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          freqs.update(k, freqs.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      // max by (freq desc, left asc, right asc) with UTF-8 byte order for
      // the strings — Spark's orderBy compares UTF8String bytes, and Java's
      // String.compareTo (UTF-16 code units) disagrees with it for
      // supplementary-plane symbols, which would break local≡distributed
      val best =
        if (freqs.isEmpty) None
        else Some(freqs.min(new Ordering[((String, String), Long)] {
          def compare(a: ((String, String), Long), b: ((String, String), Long)): Int = {
            val c0 = java.lang.Long.compare(b._2, a._2) // freq desc
            if (c0 != 0) c0
            else {
              val c1 = utf8Compare(a._1._1, b._1._1)
              if (c1 != 0) c1 else utf8Compare(a._1._2, b._1._2)
            }
          }
        }))
      best.filter(_._2 >= minFreq) match {
        case Some(((l, r), f)) =>
          merges += Merge(rank, l, r, f)
          vocab = vocab.map { case (syms, n) => (mergePair(syms, l, r), n) }
          rank += 1
        case None => done = true
      }
    }
    merges.result()
  }

  /** Convenience: word counts of a whitespace corpus — the corpus-wide
    * distributed pass (stage 1).
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("weight"))

  /** Merge table as a DataFrame (rank, left, right, freq) for query output. */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF()
  }
}
