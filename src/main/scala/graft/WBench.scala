package graft
import org.apache.spark.sql.SparkSession

/** Dev tool (optimization diagnosis, not the driver artifact): run every
  * declared query TWICE in one session and print `name,cold,warm` CSV —
  * separates per-query one-time cost (Catalyst planning, Janino codegen
  * compile, JIT) from steady-state compute. `runMain graft.WBench [sfDir]`.
  */
object WBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.attach(GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    Tables.all.foreach { t =>
      try Tables(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case t: Throwable => println(s"ERR ${t.getClass.getSimpleName}") }
      (System.nanoTime() - t0) / 1e9
    }
    println("QWARM,name,cold,warm")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val c = once(fn)
      val w = once(fn)
      println(f"QWARM,$name,$c%.3f,$w%.3f")
    }
    spark.stop()
  }
}
