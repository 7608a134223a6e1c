package graft.operators

import graft.SparkTestBase

/** Bounds-check parity with the reference Sample CLI (cli/Sample.java:125-127). */
class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  test("fraction in (0, 1] samples; outside is refused up front") {
    val df = (1 to 1000).toDF("x")
    // full fraction keeps everything; a legal small fraction runs
    assert(Sampling.bernoulli(df, 1.0, seed = 1L).count() == 1000)
    assert(Sampling.bernoulli(df, 0.01, seed = 1L).count() < 1000)
    for (bad <- Seq(0.0, -0.5, 1.5, 2.0)) {
      val e = intercept[IllegalArgumentException](Sampling.bernoulli(df, bad, seed = 1L))
      assert(e.getMessage.contains("(0, 1]"), s"fraction $bad: ${e.getMessage}")
    }
  }

  test("bernoulliByHash: content-addressed, layout-independent, near-fraction") {
    import org.apache.spark.sql.functions.col
    val df = (1 to 4000).toDF("x")
    val a = Sampling.bernoulliByHash(df, 0.1, col("x")).collect().map(_.getInt(0)).sorted
    // the draw is a pure function of the key: repartitioning cannot move it
    val b = Sampling.bernoulliByHash(df.repartition(7), 0.1, col("x"))
      .collect().map(_.getInt(0)).sorted
    assert(a.sameElements(b), "sample changed under repartition")
    // a SUBSET of the corpus keeps exactly its surviving members (regrowth
    // stability — rows never migrate in or out of the sample)
    val sub = Sampling.bernoulliByHash(df.filter(col("x") <= 2000), 0.1, col("x"))
      .collect().map(_.getInt(0)).sorted
    assert(sub.sameElements(a.filter(_ <= 2000)), "subset draw diverged")
    // md5 uniformity: 0.1 of 4000 within a loose band
    assert(a.length > 4000 * 0.05 && a.length < 4000 * 0.2, s"kept ${a.length}")
    // full fraction keeps everything; bounds refused like the RNG variant
    assert(Sampling.bernoulliByHash(df, 1.0, col("x")).count() == 4000)
    for (bad <- Seq(0.0, -0.5, 1.5)) {
      val e = intercept[IllegalArgumentException](
        Sampling.bernoulliByHash(df, bad, col("x")))
      assert(e.getMessage.contains("(0, 1]"), s"fraction $bad: ${e.getMessage}")
    }
  }
}
