package graft.operators

import graft.SparkTestBase

class BpeTrainerSpec extends SparkTestBase {
  import spark.implicits._

  test("mergePair replaces non-overlapping occurrences left-to-right") {
    assert(BpeTrainer.mergePair(Seq("a", "b", "c"), "a", "b") == Seq("ab", "c"))
    assert(BpeTrainer.mergePair(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(BpeTrainer.mergePair(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    assert(BpeTrainer.mergePair(Seq("x"), "a", "b") == Seq("x"))
    assert(BpeTrainer.mergePair(Nil, "a", "b") == Nil)
  }

  test("learns the classic merge sequence (Sennrich corpus) with lexicographic tie-breaks") {
    // low×5 lower×2 newest×6 widest×3 — the published BPE walkthrough corpus.
    // Hand-computed with </w> markers:
    //   (e,s)=9 ties (s,t)=9 → lex picks (e,s); then (es,t)=9, (est,</w>)=9,
    //   (l,o)=7 ties (o,w)=7 → lex picks (l,o); then (lo,w)=7.
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "weight")
    val merges = BpeTrainer.train(words, "word", "weight", nMerges = 5)
    assert(merges.map(m => (m.left, m.right, m.freq)) == Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", "</w>", 9L),
      ("l", "o", 7L), ("lo", "w", 7L)))
    assert(merges.map(_.rank) == Seq(0, 1, 2, 3, 4))

    // the distributed loop (forced via collectThreshold = 0) must produce
    // the identical merge table
    val distributed = BpeTrainer.train(words, "word", "weight",
      nMerges = 5, collectThreshold = 0L)
    assert(distributed == merges, "local and distributed loops must agree")
  }

  test("is deterministic and stops when best pair drops below minFreq") {
    val words = Seq(("ab", 1L), ("cd", 1L)).toDF("word", "weight")
    // every adjacent pair occurs once < minFreq=2 → no merges at all
    assert(BpeTrainer.train(words, "word", "weight", nMerges = 3).isEmpty)

    val corpus = Seq(("spark", 4L), ("spar", 2L), ("park", 3L), ("shark", 1L))
      .toDF("word", "weight")
    val a = BpeTrainer.train(corpus, "word", "weight", nMerges = 6)
    val b = BpeTrainer.train(corpus, "word", "weight", nMerges = 6)
    assert(a == b, "rerun must reproduce the identical merge table")
    assert(a.nonEmpty)
    // ranks are dense from 0 and frequencies never increase with rank for
    // non-derived pairs is NOT guaranteed by BPE; only rank density is
    assert(a.map(_.rank) == a.indices)
  }

  test("encode applies the trained merges greedily in rank order (q133 contract)") {
    // Sennrich corpus merges (pinned above): (e,s) (es,t) (est,</w>) (l,o) (lo,w)
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "weight")
    val ranked = BpeTrainer.train(words, "word", "weight", nMerges = 5)
      .map(m => (m.left, m.right))
    // training words tokenize with the learned units
    assert(BpeTrainer.encode("newest", ranked) == Seq("n", "e", "w", "est</w>"))
    assert(BpeTrainer.encode("low", ranked) == Seq("low", "</w>"))
    assert(BpeTrainer.encode("lower", ranked) == Seq("low", "e", "r", "</w>"))
    // an unseen word falls back to partial merges, never fails
    assert(BpeTrainer.encode("lowest", ranked) == Seq("low", "est</w>"))
    assert(BpeTrainer.encode("", ranked) == Seq("</w>"))
  }
}
