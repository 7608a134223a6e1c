package graft
/** Dev tool (optimization diagnosis): noop-sink full-scan time per base
  * table — quantifies the single-row-group decode floor of the testdata
  * (each parquet is ONE row group, so a scan decodes on one core no matter
  * the split config). `runMain graft.SProbe [sfDir]`.
  */
object SProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.attach(GraftSession.builder("local[32]", 32)
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    for (t <- Seq("lineitem", "orders", "events", "documents", "embeddings")) {
      Tables(spark, dir, t).count()
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        Tables(spark, dir, t).write.format("noop").mode("overwrite").save()
        println(f"$t full-scan rep $i: ${(System.nanoTime()-t0)/1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
