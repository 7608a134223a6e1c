package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: controlled A/B timing of a list of declared queries in ONE
  * session — `runMain graft.ABench <sfDir> <q1,q2,...> [reps]`. Prints each
  * query's MIN and per-rep times (rep 1 ≈ cold planning+codegen, min ≈
  * warm steady state). Env toggles isolate the engine session hooks:
  *   SPARK_GRAFT_NO_EXTRAS=1  — register only the SQL functions, skip the
  *     extraOptimizations rules + strategy that [[GraftSession.attach]]
  *     installs (for "do the per-plan rules cost milliseconds?" A/Bs).
  */
object ABench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 2) args(2).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val noExtras = sys.env.get("SPARK_GRAFT_NO_EXTRAS").contains("1")
    val builder = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
    val spark =
      if (noExtras) {
        val s = builder.getOrCreate()
        graft.functions.expressions.HammingDistance.register(s)
        graft.functions.expressions.CosineSimilarity.register(s)
        s
      } else GraftSession.attach(builder.getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    Tables.all.foreach { t =>
      try Tables(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    def loadAvg: Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(f"== ABench cpus=$cpus noExtras=$noExtras load=$loadAvg%.2f")
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        if (sys.env.get("SPARK_GRAFT_RDD_STATS").contains("1")) {
          val pr = spark.sparkContext.getPersistentRDDs
          val mem = spark.sparkContext.getExecutorMemoryStatus.values
            .map { case (max, free) => max - free }.sum
          println(f"   rep $i: $t%.2f s persistentRDDs=${pr.size} storageUsed=${mem / 1e6}%.1fMB")
        }
        t
      }
      println(f"$name%-36s min=${times.min}%.3f  " +
        times.map(t => f"$t%.3f").mkString(" "))
      name -> times.min
    }
    println(f"== sum_min=${results.map(_._2).sum}%.3f load_end=$loadAvg%.2f")
    spark.stop()
  }
}
