package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print `explain("formatted")` for selected queries —
  * `runMain graft.Explain <sfDir> [queryName ...]` (default: a scale-critical
  * subset). Used to eyeball pushdown/broadcast/codegen per SURVEY.md §4.2.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_agg_pricing_summary", "q03_join_broadcast_revenue_by_brand",
        "q04_join_shuffle_orders", "q05_join_star_revenue_by_region",
        "q10_asof_join_latest_order_before_event", "q19_topk_orders")
    // the engine's own session shape (extensions + AQE + 32 partitions):
    // plans must match what Bench/Verify execute, and several queries need
    // the graft-registered functions to even resolve
    val spark = GraftSession.attach(GraftSession.builder("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
