package graft.tables

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** `fold(state@a, changes(a, b)) ≡ recompute(snapshot(b))` across a mixed
  * DML history, for every (a, b) version pair — the incremental-compute
  * contract of the change feed, exercised through merge, delete, update,
  * append, overwrite, and compact commits (compaction must be a NO-OP for
  * the maintained aggregate: its rewrite survivors cancel in the feed).
  */
class IncrementalAggSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    new java.io.File(Files.createTempDirectory("graft-incr").toFile, "t").getAbsolutePath

  test("maintained aggregate equals recompute for every version pair") {
    val t = GraftTable.create(spark, tmp(),
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L), (4L, "c", 40L))
        .toDF("k", "g", "cents"), keyCol = Some("k"))
    t.merge(Seq((2L, "b", 25L), (5L, "a", 50L)).toDF("k", "g", "cents")) // v2
    t.deleteWhere(col("g") === "c")                                      // v3
    t.update(Map("cents" -> (col("cents") + 1L)), col("g") === "a")      // v4
    t.append(Seq((6L, "b", 60L)).toDF("k", "g", "cents"))                // v5
    t.compact(smallFileBytes = 32L << 20)                                // v6 (no-op for agg)
    t.overwrite(Seq((7L, "a", 70L), (8L, "b", 80L)).toDF("k", "g", "cents")) // v7

    def recompute(v: Long): Set[(String, Long, Long)] =
      IncrementalAgg.init(t.snapshot(Some(v)), "g", "cents")
        .as[(String, Long, Long)].collect().toSet

    val versions = 1L to t.version
    for (a <- versions; b <- versions if b >= a) {
      val m = IncrementalAgg.maintained(t, a, b, "g", "cents")
        .as[(String, Long, Long)].collect().toSet
      assert(m == recompute(b), s"maintained($a -> $b) diverged from recompute")
    }
  }
}
