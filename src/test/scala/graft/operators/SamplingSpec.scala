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
}
