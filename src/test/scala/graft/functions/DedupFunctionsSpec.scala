package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DedupFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank now"), // near-dup of 1
    (3L, "completely different text about spark catalyst optimizer internals and codegen"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (5L, "spark catalyst optimizer internals and codegen are completely different topics")
  ).toDF("doc_id", "text")

  test("MinHash-LSH finds near-dups that exact Jaccard confirms, est within 0.35") {
    val pairs = MinHash.candidatePairs(docs, "doc_id", "text",
      numHashes = 32, bands = 8, shingleSize = 3, minEstSim = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.contains((1L, 4L)), "exact dup pair must surface")
    assert(pairs((1L, 4L)) == 1.0, "identical docs ⇒ identical signatures")
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)), "near-dup pair must surface")

    // exact 3-shingle Jaccard for (1,2): est sim should land within 0.35
    def shingles(s: String): Set[String] =
      s.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val t1 = shingles("the quick brown fox jumps over the lazy dog near the river bank today")
    val t2 = shingles("the quick brown fox jumps over the lazy dog near the river bank now")
    val exact = t1.intersect(t2).size.toDouble / t1.union(t2).size
    pairs.get((1L, 2L)).foreach(est => assert(math.abs(est - exact) <= 0.35,
      s"est=$est exact=$exact"))
  }

  test("MinHash signature is deterministic and numHashes wide") {
    val sig1 = MinHash.signatures(docs, "doc_id", "text", numHashes = 16, shingleSize = 3)
      .orderBy("doc_id").collect().map(_.getSeq[Long](1))
    val sig2 = MinHash.signatures(docs, "doc_id", "text", numHashes = 16, shingleSize = 3)
      .orderBy("doc_id").collect().map(_.getSeq[Long](1))
    assert(sig1.map(_.toList).toSeq == sig2.map(_.toList).toSeq)
    assert(sig1.forall(_.length == 16))
    assert(sig1(0).toList == sig1(3).toList, "exact dups share the signature")
  }

  test("SimHash: identical docs share fingerprints; near-dups are hamming-close") {
    val fps = SimHash.fingerprints(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(4L))
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fps(1L), fps(2L)) <= 12, s"near-dup hamming=${hamming(fps(1L), fps(2L))}")
    assert(hamming(fps(1L), fps(3L)) > hamming(fps(1L), fps(2L)),
      "unrelated text must be farther than a near-dup")
  }
}
