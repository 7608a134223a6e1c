package graft

import org.apache.spark.sql.catalyst.plans.logical.Window

/** Dev tool: scale-smell audit over EVERY declared query's optimized plan —
  * `runMain graft.PlanAudit <sfDir>`. Reports each query whose plan contains
  * a Window with an empty partitionSpec (the all-rows-to-one-task shape that
  * breaks at 100 TB unless the frame is provably post-aggregation-bounded)
  * so the allowlist in SURVEY §2.3 stays honest as the surface grows.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val flagged = Seq.newBuilder[(String, Int)]
    val errors = Seq.newBuilder[(String, String)]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val n = df.queryExecution.optimizedPlan.collect {
          case w: Window if w.partitionSpec.isEmpty => w
        }.size
        if (n > 0) flagged += name -> n
      } catch { case t: Throwable =>
        errors += name -> (t.getClass.getSimpleName + ": " +
          Option(t.getMessage).getOrElse("").linesIterator.take(1).mkString.take(120))
      }
    }
    println("== queries with partition-less Window operators ==")
    flagged.result().foreach { case (q, n) => println(s"AUDIT $q windows=$n") }
    println("== errors (builder failed before a plan existed) ==")
    errors.result().foreach { case (q, e) => println(s"AUDIT-ERR $q $e") }
    spark.stop()
  }
}
