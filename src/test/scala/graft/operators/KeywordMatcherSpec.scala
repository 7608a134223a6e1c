package graft.operators

import graft.SparkTestBase

class KeywordMatcherSpec extends SparkTestBase {

  /** Brute force: count every occurrence (all start positions, overlapping
    * included) of each keyword.
    */
  private def brute(text: String, kws: Seq[String]): Seq[Long] =
    kws.map { kw =>
      var c = 0L
      var i = text.indexOf(kw)
      while (i >= 0) { c += 1; i = text.indexOf(kw, i + 1) }
      c
    }

  test("counts every occurrence, overlapping and nested keywords included") {
    val kws = Seq("aba", "ab", "ba", "abab", "x")
    val auto = KeywordMatcher.build(kws)
    for (text <- Seq("ababa", "abababab", "xxx", "", "ab", "ba", "aabbaabb",
        "abaabaaba")) {
      val got = KeywordMatcher.countHits(auto, text).toSeq
      assert(got == brute(text, kws), s"text=$text got=$got want=${brute(text, kws)}")
    }
  }

  test("property: random texts over a tiny alphabet match brute force") {
    val kws = Seq("aa", "ab", "aab", "bba", "abab", "bb")
    val auto = KeywordMatcher.build(kws)
    var seed = 42L
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
    for (_ <- 1 to 200) {
      val len = (math.abs(next()) % 40).toInt
      val text = (0 until len).map(_ => if (math.abs(next()) % 2 == 0) 'a' else 'b').mkString
      assert(KeywordMatcher.countHits(auto, text).toSeq == brute(text, kws), s"text=$text")
    }
  }

  test("corpus rollup equals per-doc brute force through Spark") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the table scan found a table"),
      (2L, "spark spark spark"),
      (3L, "no hits here"),
      (4L, "tabletable")).toDF("doc_id", "text")
    val got = KeywordMatcher.tagCounts(s, docs, "doc_id", "text",
        Seq("table", "scan", "spark"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("table", 2L, 4L), ("scan", 1L, 1L), ("spark", 1L, 3L)))
  }

  test("rejects empty and duplicate keyword lists") {
    intercept[IllegalArgumentException](KeywordMatcher.build(Nil))
    intercept[IllegalArgumentException](KeywordMatcher.build(Seq("a", "")))
    intercept[IllegalArgumentException](KeywordMatcher.build(Seq("a", "a")))
  }
}
