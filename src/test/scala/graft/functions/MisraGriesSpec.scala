package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MisraGriesSpec extends SparkTestBase {
  import spark.implicits._

  test("sketch no-miss guarantee: every item above n/(k+1) survives reduce+merge") {
    val agg = MisraGriesAgg(4)
    // adversarial stream: 2 genuinely heavy items buried in 40 distinct light ones
    val stream = Seq.fill(30)("heavy1") ++ Seq.fill(20)("heavy2") ++
      (0 until 40).map(i => s"light$i")
    val n = stream.size // 90; threshold n/(k+1) = 18
    // arbitrary partitioning + merge order must preserve the guarantee
    for (splits <- Seq(2, 3, 7); shift <- Seq(0, 13)) {
      val parts = stream.drop(shift) ++ stream.take(shift)
      val buffers = parts.grouped(math.max(1, parts.size / splits))
        .map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
      val merged = buffers.reduce(agg.merge)
      assert(merged.contains("heavy1") && merged.contains("heavy2"),
        s"splits=$splits shift=$shift lost a heavy hitter: $merged")
      assert(merged.size <= 4)
      // counts are underestimates, never overestimates
      assert(merged("heavy1") <= 30 && merged("heavy2") <= 20)
    }
  }

  test("heavyHitters equals the exact groupBy + HAVING result") {
    val rng = new scala.util.Random(3)
    val words = (Seq.fill(300)("alpha") ++ Seq.fill(150)("beta") ++
      Seq.fill(90)("gamma") ++ Seq.fill(1000)(s"tail${rng.nextInt(500)}"))
    val df = rng.shuffle(words).toDF("w")
    val got = MisraGries.heavyHitters(df, col("w"), phi = 0.05, k = 32)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = words.size
    val want = words.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 > 0.05 * total).toMap
    assert(got == want, s"got $got want $want")
    assert(got.keySet == Set("alpha", "beta", "gamma"))
  }

  test("the exact pass pushes the candidate IN filter into the scan") {
    val dir = java.nio.file.Files.createTempDirectory("mg-push").toString
    (Seq.fill(50)("hot") ++ (0 until 30).map(i => s"cold$i")).toDF("w")
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val hh = MisraGries.heavyHitters(df, col("w"), phi = 0.2, k = 16)
    val scans = hh.queryExecution.executedPlan.collectLeaves().map(_.toString)
    assert(scans.exists(s => s.contains("PushedFilters") && s.contains("In(w")),
      s"candidate IN filter must reach the parquet scan: ${scans.mkString}")
    assert(hh.collect().map(_.getString(0)).toSeq == Seq("hot"))
  }
}
