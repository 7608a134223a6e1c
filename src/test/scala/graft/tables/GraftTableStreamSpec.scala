package graft.tables

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class GraftTableStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String = "graft-table-stream"): String =
    new java.io.File(Files.createTempDirectory(prefix).toFile, "t").getAbsolutePath

  private def ckpt(): String =
    Files.createTempDirectory("graft-table-stream-ckpt").toString

  /** Drain the table stream into a memory sink and return the sink rows. */
  private def drain(t: GraftTable, name: String, checkpoint: String,
      opts: Map[String, String] = Map.empty): Set[(Long, String)] = {
    val src = opts.foldLeft(
      spark.readStream.format("graft-table").option("path", t.location)) {
      case (r, (k, v)) => r.option(k, v)
    }.load()
    val q = src.writeStream.format("memory").queryName(name)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    spark.table(name).as[(Long, String)].collect().toSet
  }

  test("streams every appended commit once; restarts resume from the offset") {
    val t = GraftTable.create(spark, tmp(), Seq((1L, "a")).toDF("k", "v"))
    t.append(Seq((2L, "b")).toDF("k", "v"))
    val cp = ckpt()
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    def run(): Unit = {
      val q = t.readStream.writeStream
        .option("checkpointLocation", cp)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.as[(Long, String)].collect().foreach(seen.add); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    run()
    assert(seen.asScala.toSet == Set((1L, "a"), (2L, "b")))
    // new commits land; a restarted query on the SAME checkpoint delivers
    // only the new rows (version offsets persisted, no re-read)
    t.append(Seq((3L, "c")).toDF("k", "v"))
    t.appendIfAbsent("tx-1", Seq((4L, "d")).toDF("k", "v"))
    run()
    assert(seen.asScala.toSeq.sorted ==
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")),
      "a restart re-delivered already-committed rows")
  }

  test("startingVersion skips history; schema evolution null-fills old files") {
    val loc = tmp()
    val t = GraftTable.create(spark, loc, Seq((1L, "a")).toDF("k", "v"))
    t.append(Seq((2L, "b")).toDF("k", "v"))
    t.append(Seq((3L, "c", 7L)).toDF("k", "v", "extra"), mergeSchema = true)
    val src = spark.readStream.format("graft-table").option("path", loc)
      .option("startingVersion", "1").load()
    val q = src.writeStream.format("memory").queryName("s2")
      .option("checkpointLocation", ckpt())
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    // version 1 (create) skipped; the pre-evolution v2 file null-fills extra
    assert(spark.table("s2").as[(Long, String, Option[Long])].collect().toSet ==
      Set((2L, "b", None), (3L, "c", Some(7L))))
  }

  test("non-append commit fails the stream loud; skipChangeCommits skips it") {
    val t = GraftTable.create(spark, tmp(), Seq((1L, "a")).toDF("k", "v"))
    t.overwrite(Seq((2L, "B")).toDF("k", "v")) // removes the create file
    t.append(Seq((3L, "c")).toDF("k", "v"))
    val e = intercept[Exception] { drain(t, "s3", ckpt()) }
    def causes(x: Throwable): Seq[Throwable] =
      if (x == null) Seq.empty else x +: causes(x.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).map(_.getMessage).filter(_ != null)
        .exists(_.contains("append-only")), s"unexpected failure: $e")
    // with the option: the overwrite commit is skipped WHOLESALE (its adds
    // don't appear either) — downstream sees only whole appended commits
    assert(drain(t, "s4", ckpt(), Map("skipChangeCommits" -> "true")) ==
      Set((1L, "a"), (3L, "c")))
  }

  test("unsupported column types are rejected at stream construction, loud") {
    val loc = tmp()
    GraftTable.create(spark, loc,
      Seq((1L, BigDecimal("2.50"))).toDF("k", "price"))
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft-table").option("path", loc).load()
        .writeStream.format("memory").queryName("s5")
        .option("checkpointLocation", ckpt())
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    def causes(x: Throwable): Seq[Throwable] =
      if (x == null) Seq.empty else x +: causes(x.getCause)
    assert(causes(e).map(_.getMessage).filter(_ != null)
      .exists(_.contains("flat atomic schemas")), s"unexpected failure: $e")
  }

  test("native streaming sink: epochs land as txn-tagged commits, no dupes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val loc = tmp()
    val t = GraftTable.create(spark, loc, Seq.empty[(Long, String)].toDF("k", "v"))
    val cp = ckpt()
    val in = MemoryStream[(Long, String)]
    def run(): Unit = {
      val q = in.toDF().toDF("k", "v").writeStream.format("graft-table")
        .option("path", loc).option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    in.addData((1L, "a"), (2L, "b"))
    run()
    assert(t.snapshot().as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    assert(t.history.last.op == "streamingAppend")
    val vAfterFirst = t.version
    // a restart with NO new data replays nothing and commits nothing
    run()
    assert(t.version == vAfterFirst, "an empty restart added log versions")
    // new data lands exactly once across a restart
    in.addData((3L, "c"))
    run()
    assert(t.snapshot().as[(Long, String)].collect().toSeq.sorted ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")), "restart duplicated rows")
    // the stream-written files round-trip through the BATCH read with the
    // exact table schema, and compaction re-derives zone-map stats for them
    t.append(Seq((4L, "d")).toDF("k", "v"))
    t.compact(smallFileBytes = 32L << 20)
    assert(t.snapshot().as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
  }

  test("streaming sink via the catalog: writeStream.toTable, read back in SQL") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val wh = Files.createTempDirectory("graft-cat-sink").toString
    spark.conf.set("spark.sql.catalog.gsink", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsink.root", wh)
    try {
      spark.sql("CREATE TABLE gsink.st (k BIGINT, v STRING)")
      val in = MemoryStream[(Long, String)]
      in.addData((10L, "x"), (11L, "y"))
      val q = in.toDF().toDF("k", "v").writeStream
        .option("checkpointLocation", ckpt())
        .trigger(Trigger.AvailableNow()).toTable("gsink.st")
      try q.awaitTermination() finally q.stop()
      assert(spark.sql("SELECT k, v FROM gsink.st ORDER BY k")
        .as[(Long, String)].collect().toSeq == Seq((10L, "x"), (11L, "y")))
    } finally {
      spark.conf.unset("spark.sql.catalog.gsink")
      spark.conf.unset("spark.sql.catalog.gsink.root")
    }
  }

  test("streaming sink rejects schema permutations and non-flat types loud") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val loc = tmp()
    GraftTable.create(spark, loc, Seq.empty[(Long, String)].toDF("k", "v"))
    val in = MemoryStream[(String, Long)]
    in.addData(("x", 1L)) // a batch must exist for the sink to be planned
    val e = intercept[Exception] {
      val q = in.toDF().toDF("v", "k").writeStream.format("graft-table")
        .option("path", loc).option("checkpointLocation", ckpt())
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    def causes(x: Throwable): Seq[Throwable] =
      if (x == null) Seq.empty else x +: causes(x.getCause)
    assert(causes(e).map(_.getMessage).filter(_ != null)
      .exists(_.contains("does not match table")), s"unexpected failure: $e")
  }

  test("stream -> table -> stream: the incremental loop composes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val loc = tmp()
    val t = GraftTable.create(spark, loc, Seq.empty[(Long, String)].toDF("k", "v"))
    // upstream: memory stream exactly-once INTO the table
    val in = MemoryStream[(Long, String)]
    val up = in.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", ckpt())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        GraftTable.at(spark, loc).appendIfAbsent(s"up-$batchId", batch); ()
      }.start()
    try {
      in.addData((1L, "a"), (2L, "b"))
      up.processAllAvailable()
      in.addData((3L, "c"))
      up.processAllAvailable()
    } finally up.stop()
    // downstream: the table OUT as a stream — sees exactly the three rows
    assert(drain(t, "s6", ckpt()) == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }
}
