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

  test("maxFilesPerTrigger: a backlog of N files drains in ceil(N/cap) batches") {
    val loc = tmp()
    val t = GraftTable.create(spark, loc, Seq((0L, "seed")).toDF("k", "v"))
    // one commit adding 6 one-row files: admission must cut MID-commit
    // (repartitionByRange on 6 distinct keys -> exactly one row per file;
    // a round-robin repartition can leave empty partitions = fewer files)
    t.append(spark.range(1, 7).select(col("id").as("k"), lit("x").as("v"))
      .repartitionByRange(6, col("k")))
    assert(t.history.last.added == 6, "fixture must add exactly 6 files")
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("graft-table").option("path", loc)
      .option("maxFilesPerTrigger", "2").load()
      .writeStream.option("checkpointLocation", ckpt())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.add(batch.count()); ()
      }
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val sizes = batches.asScala.toSeq
    // 7 one-row files at cap 2 -> ceil(7/2) = 4 triggers, none above cap
    assert(sizes.sum == 7, s"expected all 7 rows, got $sizes")
    assert(sizes.size == 4, s"expected 4 batches (ceil(7/2)), got $sizes")
    assert(sizes.forall(_ <= 2), s"a batch exceeded the 2-file cap: $sizes")
  }

  test("admission offsets: mid-commit cut resumes exactly after a restart") {
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val loc = tmp()
    val t = GraftTable.create(spark, loc, Seq((0L, "seed")).toDF("k", "v"))
    t.append(spark.range(1, 6).select(col("id").as("k"), lit("x").as("v"))
      .repartitionByRange(5, col("k"))) // commit 2: five one-row files
    assert(t.history.last.added == 5, "fixture must add exactly 5 files")
    t.append(Seq((6L, "y")).toDF("k", "v")) // commit 3: one file
    def stream() = new GraftTableMicroBatchStream(loc, t.schema,
      new CaseInsensitiveStringMap(Map("path" -> loc).asJava))
    val limit = org.apache.spark.sql.connector.read.streaming.ReadLimit.maxFiles(3)
    val s1 = stream()
    val o0 = s1.initialOffset()
    val o1 = s1.latestOffset(o0, limit)
    // 1 (create) + 2 of commit 2 = 3 files -> offset cut mid-commit-2
    assert(GraftVersionOffset.of(o1) == GraftVersionOffset(1L, 2L), s"got $o1")
    val b1 = s1.planInputPartitions(o0, o1)
    assert(b1.length == 3)
    // RESTART: a fresh stream resumes from the serialized offset
    val s2 = stream()
    val resumed = s2.deserializeOffset(o1.json())
    val o2 = s2.latestOffset(resumed, limit)
    assert(GraftVersionOffset.of(o2) == GraftVersionOffset(2L, 0L), s"got $o2")
    val b2 = s2.planInputPartitions(resumed, o2)
    assert(b2.length == 3) // remaining 3 of commit 2
    val o3 = s2.latestOffset(o2, limit)
    assert(GraftVersionOffset.of(o3) == GraftVersionOffset(3L, 0L), s"got $o3")
    val b3 = s2.planInputPartitions(o2, o3)
    assert(b3.length == 1)
    // caught up: offset stays put
    assert(s2.latestOffset(o3, limit) == o3)
    // every file delivered exactly once across the batches
    val all = (b1 ++ b2 ++ b3).map(_.asInstanceOf[GraftFilePartition].path)
    assert(all.distinct.length == 7, s"dup or gap in $all")
    // pre-admission-control checkpoints (bare version) deserialize unchanged
    assert(GraftVersionOffset.fromJson("2") == GraftVersionOffset(2L, 0L))
  }

  test("maxBytesPerTrigger caps batches; an oversized file still progresses") {
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val loc = tmp()
    val t = GraftTable.create(spark, loc, Seq((0L, "seed")).toDF("k", "v"))
    t.append(Seq((1L, "a")).toDF("k", "v"))
    t.append(Seq((2L, "b")).toDF("k", "v"))
    val st = new GraftTableMicroBatchStream(loc, t.schema,
      new CaseInsensitiveStringMap(Map("path" -> loc).asJava))
    // 1 byte: every file is oversized — each trigger must still admit
    // exactly one file (progress guarantee), so 3 files = 3 triggers
    val limit = org.apache.spark.sql.connector.read.streaming.ReadLimit.maxBytes(1L)
    var off = st.initialOffset()
    var batches = 0
    var files = 0
    var advanced = true
    while (advanced) {
      val next = st.latestOffset(off, limit)
      if (next == off) advanced = false
      else {
        val parts = st.planInputPartitions(off, next)
        assert(parts.length == 1, s"byte cap admitted ${parts.length} files")
        batches += 1; files += parts.length; off = next
      }
    }
    assert(batches == 3 && files == 3)
  }

  test("stream-written files carry zone maps: scan prunes without compact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val loc = tmp()
    val t = GraftTable.create(spark, loc,
      Seq.empty[(Long, String)].toDF("k", "v"), keyCol = Some("k"))
    val in = MemoryStream[(Long, String)]
    val cp = ckpt()
    def run(): Unit = {
      val q = in.toDF().toDF("k", "v").writeStream.format("graft-table")
        .option("path", loc).option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    // two epochs with disjoint key ranges -> two files with disjoint zones
    in.addData((1L, "alpha"), (2L, "beta"))
    run()
    in.addData((100L, "omega"), (101L, "psi"))
    run()
    // the create commit's zero-row file legitimately has no stats; every
    // stream-written (row-bearing) file must carry zone maps + key stats
    val files = t.currentFiles.filter(_.rows > 0)
    assert(files.size == 2 && files.forall(_.cs.nonEmpty),
      s"stream-written files lack zone maps: $files")
    assert(files.forall(_.stats.nonEmpty),
      "keyed table: stream-written files lack merge key stats")
    // data skipping reads ONLY the file whose range can hold k = 100
    val pruned = t.scan(col("k") === 100L)
    assert(pruned.inputFiles.length == 1,
      s"expected 1 surviving file, got ${pruned.inputFiles.length}")
    assert(pruned.as[(Long, String)].collect().toSet == Set((100L, "omega")))
    // string zones prune too
    assert(t.scan(col("v") === "alpha").inputFiles.length == 1)
    // a merge against a disjoint key range rewrites NOTHING (key pruning)
    val vBefore = t.version
    t.merge(Seq((500L, "new")).toDF("k", "v"))
    assert(t.history.last.removed == 0,
      "merge rewrote a stream-written file whose key range excludes the source")
    assert(t.version == vBefore + 1)
  }

  test("readStream.table through the catalog: same source, admission included") {
    val wh = Files.createTempDirectory("graft-cat-src").toString
    spark.conf.set("spark.sql.catalog.gsrc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsrc.root", wh)
    try {
      spark.sql("CREATE TABLE gsrc.st (k BIGINT, v STRING)")
      spark.sql("INSERT INTO gsrc.st VALUES (1, 'a'), (2, 'b')")
      spark.sql("INSERT INTO gsrc.st VALUES (3, 'c')")
      val batches = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val q = spark.readStream.option("maxFilesPerTrigger", "1")
        .table("gsrc.st")
        .writeStream.option("checkpointLocation", ckpt())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batches.add(batch.count()); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
      val sizes = batches.asScala.toSeq
      // 1 create(empty: zero files added? creation writes one empty file)
      // + insert files drain one file per trigger under the cap
      assert(sizes.sum == 3, s"expected all 3 rows, got $sizes")
      assert(sizes.forall(_ <= 2), s"a batch exceeded the 1-file cap: $sizes")
    } finally {
      spark.conf.unset("spark.sql.catalog.gsrc")
      spark.conf.unset("spark.sql.catalog.gsrc.root")
    }
  }

  test("rename mid-stream: metadata commit passes through, files resolve") {
    val loc = tmp()
    val t = GraftTable.create(spark, loc, Seq((1L, "a")).toDF("k", "v"))
    val cp = ckpt()
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    def run(): Unit = {
      val q = spark.readStream.format("graft-table").option("path", loc).load()
        .writeStream.option("checkpointLocation", cp)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => seen.add((r.getLong(0), r.getString(1)))); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    // first drain under the original names
    run()
    assert(seen.asScala.toSet == Set((1L, "a")))
    // a rename is a 0-add/0-remove commit: NOT a change commit — the
    // stream passes it silently; files before AND after carry the stable
    // physical name, so the resumed stream keeps resolving both eras
    t.renameColumn("v", "label")
    t.append(Seq((2L, "b")).toDF("k", "label"))
    run()
    assert(seen.asScala.toSet == Set((1L, "a"), (2L, "b")))
  }

  test("colmap drift MID-RUN fails the source loud; restart re-anchors") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val loc = tmp()
    val t = GraftTable.create(spark, loc, Seq((1L, "a")).toDF("k", "v"))
    // a live stream instance anchors the colmap at construction ...
    val s1 = new GraftTableMicroBatchStream(loc, t.schema,
      CaseInsensitiveStringMap.empty())
    assert(GraftVersionOffset.of(
      s1.latestOffset(s1.initialOffset(), ReadLimit.allAvailable())).version == 1L)
    // ... and a rename landing MID-RUN fails the next trigger loud
    t.renameColumn("v", "label")
    val e = intercept[IllegalStateException](
      s1.latestOffset(s1.initialOffset(), ReadLimit.allAvailable()))
    assert(e.getMessage.contains("column mapping changed mid-stream"), e.getMessage)
    // a schema captured BEFORE the rename cannot pair with the new colmap:
    // construction itself is loud (the anchoring-window fix, ADVICE r11)
    val stale = intercept[IllegalArgumentException](
      new GraftTableMicroBatchStream(loc,
        new org.apache.spark.sql.types.StructType()
          .add("k", org.apache.spark.sql.types.LongType)
          .add("v", org.apache.spark.sql.types.StringType),
        CaseInsensitiveStringMap.empty()))
    assert(stale.getMessage.contains("no longer exist"), stale.getMessage)
    // a fresh instance against the CURRENT schema re-anchors and reads
    val re = GraftTable.at(spark, loc)
    val s2 = new GraftTableMicroBatchStream(loc, re.schema,
      CaseInsensitiveStringMap.empty())
    assert(GraftVersionOffset.of(
      s2.latestOffset(s2.initialOffset(), ReadLimit.allAvailable())).version == 2L)
  }

  test("double rename under restarts: both file eras resolve, never null-fill") {
    val loc = tmp()
    val t = GraftTable.create(spark, loc, Seq((1L, "a")).toDF("k", "v"))
    t.renameColumn("v", "label")   // era 2: files still store physical 'v'
    t.append(Seq((2L, "b")).toDF("k", "label"))
    t.renameColumn("label", "tag") // era 3: same physical 'v' again
    t.append(Seq((3L, "c")).toDF("k", "tag"))
    // a stream anchored on the NEWEST mapping reads all three eras by the
    // stable physical name — the double-rename null-fill regression
    val got = drain(GraftTable.at(spark, loc), "dblrn", ckpt())
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("skipChangeCommits: offset advances past a run of change commits") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val loc = tmp()
    val t = GraftTable.create(spark, loc, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val src = new GraftTableMicroBatchStream(loc, t.schema,
      new CaseInsensitiveStringMap(Map("skipChangeCommits" -> "true").asJava))
    // drain the create commit
    val o1 = src.latestOffset(src.initialOffset(), ReadLimit.allAvailable())
    assert(GraftVersionOffset.of(o1) == GraftVersionOffset(1L, 0L))
    // a run of PURE change commits (remove-bearing): v2 delete (partial, so
    // a file is rewritten/DV'd — a FULL delete would just drop the file and
    // the overwrite after it would remove nothing), v3 overwrite
    t.deleteWhere(col("k") === 1L)
    t.overwrite(Seq((9L, "z")).toDF("k", "v"))
    // zero files are admitted, but the offset still ADVANCES past the run
    // (a stale offset would re-walk the same commits every trigger)
    val o2 = src.latestOffset(o1, ReadLimit.allAvailable())
    assert(GraftVersionOffset.of(o2) == GraftVersionOffset(3L, 0L),
      s"offset did not advance past skipped change commits: ${o2.json}")
    assert(src.planInputPartitions(o1, o2).isEmpty)
  }

  test("sink anchor validates schema against the table at first epoch") {
    val loc = tmp()
    val t = GraftTable.create(spark, loc, Seq((1L, "a")).toDF("k", "v"))
    // a write whose schema was captured before a rename: the LAZY colmap
    // anchor (first epoch) must refuse the stale pairing loud
    val w = new GraftStreamingWrite(loc, t.schema, "q-anchor-test")
    GraftTable.at(spark, loc).renameColumn("v", "label")
    val e = intercept[IllegalArgumentException](w.commit(0L, Array.empty))
    assert(e.getMessage.contains("between stream definition and first epoch"),
      e.getMessage)
  }

  test("streaming sink enforces CHECK constraints per row; epoch aborts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val loc = tmp()
    val t = GraftTable.create(spark, loc, Seq((1L, 10L)).toDF("k", "n"))
    t.addConstraint("n_pos", "n >= 0")
    val in = MemoryStream[(Long, Long)]
    val q = in.toDF().toDF("k", "n").writeStream
      .format("graft-table").option("path", loc)
      .option("checkpointLocation", ckpt()).start()
    try {
      in.addData((2L, 20L))
      q.processAllAvailable() // valid epoch commits under the constraint
      assert(GraftTable.at(spark, loc).snapshot().count() == 2)
      in.addData((3L, -3L), (4L, 40L))
      val e = intercept[Exception](q.processAllAvailable())
      def root(x: Throwable): Throwable =
        if (x.getCause == null || x.getCause == x) x else root(x.getCause)
      assert((Option(root(e).getMessage) ++ Option(e.getMessage)).mkString(" ")
        .contains("n_pos"), e.toString)
    } finally q.stop()
    // the violating epoch committed NOTHING — not even its valid rows
    assert(GraftTable.at(spark, loc).snapshot().as[(Long, Long)]
      .collect().toSet == Set((1L, 10L), (2L, 20L)))
  }

  test("constraint added mid-run enforces from the NEXT epoch (fresh write per epoch)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val loc = tmp()
    GraftTable.create(spark, loc, Seq((1L, 10L)).toDF("k", "n"))
    val in = MemoryStream[(Long, Long)]
    val q = in.toDF().toDF("k", "n").writeStream
      .format("graft-table").option("path", loc)
      .option("checkpointLocation", ckpt()).start()
    try {
      in.addData((2L, 20L)); q.processAllAvailable() // unconstrained epoch
      // micro-batch mode constructs a fresh StreamingWrite per epoch, so
      // a constraint added MID-RUN is compiled into the next epoch's
      // per-row checks — the violating row aborts that epoch entirely
      GraftTable.at(spark, loc).addConstraint("n_pos", "n >= 0")
      in.addData((3L, -30L), (4L, 40L))
      val e = intercept[Exception](q.processAllAvailable())
      def root(x: Throwable): Throwable =
        if (x.getCause == null || x.getCause == x) x else root(x.getCause)
      assert((Option(root(e).getMessage) ++ Option(e.getMessage)).mkString(" ")
        .contains("n_pos"), e.toString)
    } finally q.stop()
    assert(GraftTable.at(spark, loc).snapshot().as[(Long, Long)]
      .collect().toSet == Set((1L, 10L), (2L, 20L)))
  }

  test("change feed stream: merge+delete history streams exact changes() rows") {
    val loc = tmp()
    val t = GraftTable.create(spark, loc,
      Seq((1L, "a", 10L), (2L, "a", 20L)).toDF("k", "g", "x"), keyCol = Some("k"))
    t.merge(Seq((2L, "b", 200L), (3L, "b", 30L)).toDF("k", "g", "x")) // v2
    val cp = ckpt()
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, String, Long, String, Long)]()
    // incremental aggregate maintained PURELY from the streamed feed
    var state = IncrementalAgg.init(
      Seq.empty[(Long, String, Long)].toDF("k", "g", "x"), "g", "x")
    def run(): Unit = {
      val q = GraftTable.at(spark, loc).readChangeStream.writeStream
        .option("checkpointLocation", cp)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => seen.add(
            (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3), r.getLong(4))))
          state = IncrementalAgg.applyChanges(state, batch, "g", "x")
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    run() // batch (0, 2]: create inserts + the merge's net diff
    t.deleteWhere(col("k") === 1L)              // v3: change commit
    t.append(Seq((4L, "a", 40L)).toDF("k", "g", "x")) // v4
    run() // restart resumes at the checkpointed version offset: (2, 4]
    // the stream delivered EXACTLY the batch-side changes() rows
    val truth = t.changes(0L, t.version).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3), r.getLong(4)))
      .toSeq.sorted
    assert(seen.asScala.toSeq.sorted == truth,
      s"stream feed diverged from batch changes():\n stream=${seen.asScala.toSeq.sorted}\n truth=$truth")
    // deletes flowed: k=1's delete and the merge's k=2 net update pair
    assert(seen.asScala.exists(_._4 == "delete"))
    // the incrementally-maintained aggregate equals a full recompute
    val got = state.as[(String, Long, Long)].collect().toSet
    val want = IncrementalAgg.init(t.snapshot(), "g", "x")
      .as[(String, Long, Long)].collect().toSet
    assert(got == want, s"incremental state $got != recompute $want")
  }

  test("change feed startingVersion: the stream serves changes(N, …) only") {
    val loc = tmp()
    val t = GraftTable.create(spark, loc, Seq((1L, "a")).toDF("k", "v"))
    t.append(Seq((2L, "b")).toDF("k", "v")) // v2
    t.deleteWhere(col("k") === 1L)          // v3 (change commit)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, String, Long)]()
    val q = spark.readStream.format("graft-table-cdf")
      .option("path", loc).option("startingVersion", "2").load()
      .writeStream.option("checkpointLocation", ckpt())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => seen.add(
          (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))); ()
      }
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    // only commit 3's net diff: the delete of (1, a)
    assert(seen.asScala.toSet == Set((1L, "a", "delete", 3L)), seen.asScala.toSet)
  }

  test("compaction mid-stream is invisible: no duplicates, no failure") {
    val loc = tmp()
    val t = GraftTable.create(spark, loc, Seq((1L, "a")).toDF("k", "v").coalesce(1))
    t.append(Seq((2L, "b")).toDF("k", "v").coalesce(1))
    val cp = ckpt()
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    def run(): Unit = {
      val q = t.readStream.writeStream.option("checkpointLocation", cp)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.as[(Long, String)].collect().foreach(seen.add); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    run()
    assert(seen.asScala.toSet == Set((1L, "a"), (2L, "b")))
    // a maintenance compaction rewrites BOTH delivered files — flagged
    // dataChange=false, the stream skips it silently (its rows were
    // already delivered; failing would kill streams over every
    // maintained table, emitting would duplicate)
    t.compact(smallFileBytes = 32L << 20, targetBytes = 64L << 20)
    t.append(Seq((3L, "c")).toDF("k", "v"))
    run()
    assert(seen.asScala.toSeq.sorted == Seq((1L, "a"), (2L, "b"), (3L, "c")),
      s"compaction duplicated or dropped rows: ${seen.asScala.toSeq.sorted}")
  }

  test("change feed maxCommitsPerTrigger drains a backlog in bounded slices") {
    val loc = tmp()
    val t = GraftTable.create(spark, loc, Seq((1L, "a")).toDF("k", "v"))
    (2L to 7L).foreach(i => t.append(Seq((i, s"v$i")).toDF("k", "v"))) // v2..v7
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Set[Long]]()
    val q = spark.readStream.format("graft-table-cdf")
      .option("path", loc).option("maxCommitsPerTrigger", "2").load()
      .writeStream.option("checkpointLocation", ckpt())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.add(batch.select("_version").collect().map(_.getLong(0)).toSet); ()
      }
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val got = batches.asScala.toSeq.filter(_.nonEmpty)
    // 7 commits at <= 2 commits per trigger: ceil(7/2) = 4 slices, in order
    assert(got.size == 4, s"expected 4 bounded slices, got $got")
    assert(got.forall(_.size <= 2), s"a slice exceeded the 2-commit cap: $got")
    assert(got.flatten.toSet == (1L to 7L).toSet, s"missing commits: $got")
    // Trigger.Once passes allAvailable(): the cap must NOT apply — one
    // batch carries the whole remaining backlog (a capped Once would
    // terminate "successfully" with commits unprocessed)
    t.append(Seq((8L, "v8")).toDF("k", "v"))
    t.append(Seq((9L, "v9")).toDF("k", "v"))
    t.append(Seq((10L, "v10")).toDF("k", "v"))
    val once = new java.util.concurrent.ConcurrentLinkedQueue[Set[Long]]()
    @annotation.nowarn("cat=deprecation")
    val q2 = spark.readStream.format("graft-table-cdf")
      .option("path", loc).option("maxCommitsPerTrigger", "1").load()
      .writeStream.option("checkpointLocation", ckpt())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        once.add(batch.select("_version").collect().map(_.getLong(0)).toSet); ()
      }
      .trigger(Trigger.Once()).start()
    try q2.awaitTermination() finally q2.stop()
    assert(once.asScala.toSeq.map(_.size).sum >= 10 &&
      once.asScala.size == 1, s"Trigger.Once did not drain in one batch: $once")
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
