package graft.functions

import graft.SparkTestBase
import graft.functions.expressions.HammingDistance
import org.apache.spark.sql.functions._

class HammingDistanceSpec extends SparkTestBase {
  import spark.implicits._

  test("hamming64 evaluates correctly via Column API, SQL registry, and codegen") {
    val df = Seq((0L, 0L), (1L, 0L), (-1L, 0L), (0xF0F0L, 0x0F0FL))
      .toDF("a", "b")
    val viaCol = df.select(HammingDistance.hamming64(col("a"), col("b")))
      .collect().map(_.getLong(0)).toSeq
    assert(viaCol == Seq(0L, 1L, 64L, 16L))

    HammingDistance.register(spark)
    val viaSql = df.select(expr("hamming64(a, b)")).collect().map(_.getLong(0)).toSeq
    assert(viaSql == viaCol)

    // stays inside whole-stage codegen (no codegen fence for the expression);
    // needs a non-local relation or the optimizer constant-folds the whole plan
    val big = spark.range(1000)
      .select(col("id").as("a"), (col("id") * 3).as("b"))
      .select(expr("hamming64(a, b)").as("d"))
    val plan = big.queryExecution.executedPlan.toString()
    assert(plan.contains("*(1) Project [hamming64"),
      s"expression must sit inside a codegen stage (the *(n) marker): $plan")
    assert(big.agg(max(col("d"))).collect()(0).getLong(0) <= 64)
  }

  test("banded simhash neardup join finds all pairs within maxDist (pigeonhole exactness)") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank now"),
      (3L, "completely different text about spark catalyst optimizer internals and codegen"),
      (4L, "the quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("doc_id", "text")
    val banded = SimHash.neardupPairs(docs, "doc_id", "text", maxDist = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    // ground truth: brute-force over the fingerprints
    val fps = SimHash.fingerprints(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = fps.keys.toSeq.sorted
    val truth = (for {
      i <- ids; j <- ids if i < j
      d = java.lang.Long.bitCount(fps(i) ^ fps(j)) if d <= 12
    } yield (i, j) -> d.toLong).toMap

    assert(banded == truth, "banding must be exact for d <= maxDist (pigeonhole)")
    assert(truth.contains((1L, 4L)) && truth((1L, 4L)) == 0L)
  }
}
