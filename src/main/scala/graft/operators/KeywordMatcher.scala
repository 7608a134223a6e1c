package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-keyword text tagging via an Aho–Corasick automaton (Aho & Corasick
  * '75) — the one-pass "match 10⁴ lexicon terms against every document"
  * primitive behind topic tagging, PII term scans, and blocklist filtering.
  *
  * Scale shape: the automaton is built ONCE from the keyword list (driver
  * side, O(Σ|kw|) states) and shipped to executors as a broadcast-sized
  * closure value; each document is scanned in a single left-to-right pass
  * (O(|text| + hits)) inside `mapPartitions` — the genuinely-imperative
  * per-row tier of SURVEY.md §7.3, chosen because a 10⁴-way `contains` OR
  * would be 10⁴ passes per document and a regex alternation defeats
  * codegen. No shuffle until the per-document hit counts aggregate.
  *
  * Semantics: counts EVERY occurrence end position (standard AC), so
  * keywords that can overlap themselves ("aba" in "ababa") count both
  * matches — `KeywordMatcherSpec` pins this against brute force; for
  * border-free keywords the count equals non-overlapping replace
  * arithmetic, which is what q144's oracle exploits.
  */
object KeywordMatcher {

  /** Immutable, serialization-friendly automaton: arrays indexed by state;
    * goto is a per-state immutable Char→state map (lexicon alphabets are
    * small, so map lookup beats maintaining sorted parallel arrays).
    */
  final case class Automaton(
      next: Array[Map[Char, Int]],
      fail: Array[Int],
      out: Array[List[Int]], // keyword indices ending at this state
      keywords: Array[String])

  def build(keywords: Seq[String]): Automaton = {
    require(keywords.nonEmpty, "need at least one keyword")
    require(keywords.forall(_.nonEmpty), "keywords must be non-empty")
    require(keywords.distinct.size == keywords.size, "keywords must be distinct")
    val next = scala.collection.mutable.ArrayBuffer(Map.empty[Char, Int])
    val out = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    // trie
    keywords.zipWithIndex.foreach { case (kw, ki) =>
      var s = 0
      kw.foreach { ch =>
        next(s).get(ch) match {
          case Some(t) => s = t
          case None =>
            next.append(Map.empty); out.append(Nil)
            next(s) = next(s).updated(ch, next.length - 1)
            s = next.length - 1
        }
      }
      out(s) = ki :: out(s)
    }
    // BFS fail links
    val fail = Array.fill(next.length)(0)
    val queue = scala.collection.mutable.Queue.empty[Int]
    next(0).values.foreach(queue.enqueue(_))
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      next(s).foreach { case (ch, t) =>
        queue.enqueue(t)
        var f = fail(s)
        while (f != 0 && !next(f).contains(ch)) f = fail(f)
        // next(f)(ch) is strictly shallower than t, so this can never
        // self-reference
        fail(t) = next(f).getOrElse(ch, 0)
        out(t) = out(t) ++ out(fail(t))
      }
    }
    Automaton(next.toArray, fail, out.toArray, keywords.toArray)
  }

  /** Count every occurrence of every keyword in `text`. */
  def countHits(a: Automaton, text: String): Array[Long] = {
    val counts = new Array[Long](a.keywords.length)
    var s = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      while (s != 0 && !a.next(s).contains(ch)) s = a.fail(s)
      s = a.next(s).getOrElse(ch, 0)
      a.out(s).foreach(ki => counts(ki) += 1)
      i += 1
    }
    counts
  }

  /** Per-keyword corpus rollup: (keyword, n_docs containing it, total
    * occurrences). One scan, one k-row aggregation.
    */
  def tagCounts(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, keywords: Seq[String]): DataFrame = {
    import spark.implicits._
    val auto = build(keywords)
    val hits = docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        // the automaton rides the task closure once per partition
        it.flatMap { case (id, text) =>
          val c = countHits(auto, if (text == null) "" else text)
          c.indices.collect { case ki if c(ki) > 0 =>
            (auto.keywords(ki), id, c(ki))
          }
        }
      }
      .toDF("keyword", "doc_id", "n")
    val agg = hits.groupBy(col("keyword"))
      .agg(countDistinct(col("doc_id")).as("n_docs"), sum(col("n")).as("n_occurrences"))
    // a keyword with zero corpus hits must still report (0, 0) — consumers
    // (and the q144 oracle, one SELECT arm per keyword) expect k rows always
    keywords.toDF("keyword").join(agg, Seq("keyword"), "left")
      .select(col("keyword"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_occurrences"), lit(0L)).as("n_occurrences"))
  }
}
