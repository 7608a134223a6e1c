package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Pins for the round-7 storage / sketch surface:
  *   - the q126 partitioned layout actually PRUNES at the directory level
  *     (the scan's selected partitions shrink; the data of the excluded
  *     partitions is never listed into the plan);
  *   - ORC round-trips values bit-for-bit (the q125 contract);
  *   - HLL sketch union: re-aggregating daily sketches equals sketching
  *     the whole slice directly, and at small cardinality the estimate is
  *     exact (sparse mode) — the q131 mergeability identity.
  */
class StorageSketchesSpec extends SparkTestBase {

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    df.collect() // force execution so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan
    val finalPlan = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    finalPlan.collectLeaves().collectFirst { case f: FileSourceScanExec => f }.get
  }

  test("partitioned write + partition-column filter prunes directories") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_prune_test").toString
    val root = base + "/t"
    try {
      (1 to 100).map(i => (i, s"p${i % 5}")).toDF("v", "part")
        .write.partitionBy("part").parquet(root)
      val pruned = s.read.parquet(root).where(col("part").isin("p1", "p3"))
      val full = s.read.parquet(root)
      // the executed scan's partition count is the pruned one
      val prunedParts = scanOf(pruned).metrics("numPartitions").value
      val fullParts = scanOf(full).metrics("numPartitions").value
      assert(fullParts === 5, s"expected 5 partitions, got $fullParts")
      assert(prunedParts === 2, s"expected 2 selected partitions, got $prunedParts")
      assert(pruned.count() === 40)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("orc round-trip preserves values bit-for-bit") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_orc_test").toString + "/t"
    val df = Seq((1L, "a", 1.25), (2L, "b", -0.5), (3L, null.asInstanceOf[String], 0.1))
      .toDF("k", "s", "v")
    df.write.orc(root)
    val back = s.read.schema("k BIGINT, s STRING, v DOUBLE").orc(root)
    assert(back.orderBy("k").collect().toSeq === df.orderBy("k").collect().toSeq)
  }

  test("hll union of daily sketches equals one sketch over the union; exact at low card") {
    val s = spark
    import s.implicits._
    val df = (1 to 500).map(i => (i % 7, i % 150)).toDF("day", "user")
    val viaUnion = df.groupBy("day")
      .agg(expr("hll_sketch_agg(user, 12)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est"))
      .head().getLong(0)
    val direct = df.agg(expr("hll_sketch_estimate(hll_sketch_agg(user, 12))"))
      .head().getLong(0)
    val exact = df.select(countDistinct(col("user"))).head().getLong(0)
    assert(viaUnion === direct, "union-of-parts must equal sketch-of-whole")
    assert(viaUnion === exact, "sparse-mode estimate must be exact at 150 distinct")
  }
}
