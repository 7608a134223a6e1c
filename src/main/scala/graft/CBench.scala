package graft

/** Dev tool (optimization A/B): run the first N queries cold-only under a
  * given `spark.sql.codegen.cache.maxEntries` (static conf, so it must land
  * at session creation) and print the total.
  * `runMain graft.CBench <sfDir> <maxEntries> [n]`.
  */
object CBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val maxEntries = args(1)
    val n = if (args.length > 2) args(2).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.attach(GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.sql.codegen.cache.maxEntries", maxEntries)
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    Tables.all.foreach { t =>
      try Tables(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    // same warm pass as Bench so the comparison matches its methodology
    SparkEntry.queries.toSeq.sortBy(_._1).take(12).foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val t0 = System.nanoTime()
    SparkEntry.queries.toSeq.sortBy(_._1).take(n).foreach { case (name, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case t: Throwable => println(s"ERR $name ${t.getClass.getSimpleName}") }
    }
    val total = (System.nanoTime() - t0) / 1e9
    println(f"CBENCH maxEntries=$maxEntries n=$n total=$total%.2f s")
    spark.stop()
  }
}
