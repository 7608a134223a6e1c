package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time one declared query end-to-end (noop sink, same as Bench),
  * N repetitions — `runMain graft.QTime <sfDir> <queryName> [reps]`.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // attach: queries using the graft-registered functions (hamming64,
    // cosine_sim, …) must resolve here exactly as they do under Bench
    val spark = GraftSession.attach(GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    Tables.all.foreach { t =>
      try Tables(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"$name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
