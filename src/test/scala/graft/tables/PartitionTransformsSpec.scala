package graft.tables

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hidden (transform) partitioning: `bucket(n,col)` / `days(col)` /
  * `months(col)` / `years(col)` / `truncate(w,col)` specs — write-side
  * shadow layout and driver-side file pruning of point lookups on the
  * SOURCE column. See `PartitionTransforms`.
  */
class PartitionTransformsSpec extends SparkTestBase {
  import spark.implicits._
  import PartitionTransforms._

  private def tmp(): String =
    new java.io.File(Files.createTempDirectory("graft-pt").toFile, "t").getAbsolutePath

  test("spec strings parse, render canonically, and reject junk") {
    assert(parse("k") == Identity("k"))
    assert(parse(" bucket( 8 , k )") == Bucket(8, "k"))
    assert(parse("days(ts)") == TimeUnit("days", "ts"))
    assert(parse("months(ts)") == TimeUnit("months", "ts"))
    assert(parse("years(d)") == TimeUnit("years", "d"))
    assert(parse("truncate(4,s)") == Truncate(4, "s"))
    // render round-trips through parse
    Seq(Bucket(8, "k"), TimeUnit("days", "ts"), Truncate(4, "s"), Identity("k"))
      .foreach(sp => assert(parse(sp.render) == sp))
    intercept[IllegalArgumentException](parse("hours(ts)"))
    intercept[IllegalArgumentException](parse("bucket(0,k)"))
    intercept[IllegalArgumentException](parse(""))
  }

  test("bucket(4,k): point lookup reads only the matching bucket's files") {
    val base = (0L until 200L).map(i => (i, s"v$i")).toDF("k", "s")
    val t = GraftTable.create(spark, tmp(), base.limit(0),
      keyCol = None, partitionBy = Seq("bucket(4,k)"))
    // parity-interleaved appends: both span [0,199], so zone maps on k
    // cannot tell the appends apart — only the bucket transform can prune
    t.append(base.where($"k" % 2 === 0).repartition(1))
    t.append(base.where($"k" % 2 === 1).repartition(1))
    // each append hive-splits into 4 bucket dirs -> 8 data files, and every
    // bucket file's k-RANGE spans (hash spread) so zone maps cannot prune:
    // the bucket transform is the only possible pruner
    val dataFiles = t.filesAt(t.version).filter(_.rows > 0)
    assert(dataFiles.size == 8, s"expected 8 bucket files, got ${dataFiles.size}")
    for (k <- Seq(0L, 7L, 42L, 113L, 199L)) {
      val cands = t.scanCandidates($"k" === k, t.version)
      assert(cands.size <= 2, s"k=$k: expected <=2 candidates (one per " +
        s"append at most), got ${cands.size}")
      assert(t.scan($"k" === k).select("s").as[String].collect().toSeq == Seq(s"v$k"))
    }
    // IN-list admits the union of the named buckets, result bit-equal
    val in = t.scan($"k".isin(3L, 150L)).select("s").as[String].collect().toSet
    assert(in == Set("v3", "v150"))
    assert(t.scanCandidates($"k".isin(3L, 150L), t.version).size <= 4)
    // a non-equality predicate pays nothing and prunes nothing here
    assert(t.scanCandidates($"k" > -1L, t.version).size == 8)
    assert(t.scan($"k" >= 198L).count() == 2L)
  }

  test("days(ts) over TIMESTAMP: lookup reads one day-file; nulls never lost") {
    val rows = (0 until 96).map { i =>
      (Timestamp.valueOf(f"2024-03-${1 + i % 4}%02d 0${i % 9}:${i % 60}%02d:00"), i.toLong)
    } :+ ((null: Timestamp, 999L))
    val df = rows.toDF("ts", "n")
    val t = GraftTable.create(spark, tmp(), df.repartition(1),
      partitionBy = Seq("days(ts)"))
    // 4 day dirs + the null dir; timestamps get NO zone-map stats, so only
    // the transform can prune
    val dataFiles = t.filesAt(t.version).filter(_.rows > 0)
    assert(dataFiles.size == 5, s"expected 5 files, got ${dataFiles.size}")
    val probe = Timestamp.valueOf("2024-03-02 01:01:00") // the i=1 row
    val cands = t.scanCandidates($"ts" === probe, t.version)
    // the matching day + the null dir (conservatively kept), never more
    assert(cands.size == 2, s"expected 2 candidates, got ${cands.size}")
    assert(t.scan($"ts" === probe).select("n").as[Long].collect().toSeq == Seq(1L))
    // null rows live in the null dir and are still served
    assert(t.scan($"ts".isNull).select("n").as[Long].collect().toSeq == Seq(999L))
    // absent day: only the null dir survives, zero rows come back
    assert(t.scanCandidates($"ts" === Timestamp.valueOf("2030-01-01 00:00:00"),
      t.version).size == 1)
    assert(t.scan($"ts" === Timestamp.valueOf("2030-01-01 00:00:00")).count() == 0)
  }

  test("months/years/truncate shadows agree between write and prune paths") {
    // unit-level: transformedValues == what a write-side shadow produces
    val ts = Timestamp.valueOf("2024-03-15 10:30:00")
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .convertToCatalyst(ts)
    def one(sp: PartSpec, dt: DataType, v: Any): Option[String] =
      transformedValues(spark, sp, dt, Seq(v)).get.head
    assert(one(TimeUnit("months", "ts"), TimestampType, conv) == Some("2024-03-01"))
    assert(one(TimeUnit("years", "ts"), TimestampType, conv) == Some("2024-01-01"))
    assert(one(Truncate(3, "s"), StringType,
      org.apache.spark.unsafe.types.UTF8String.fromString("abcdef")) == Some("abc"))
    assert(one(Truncate(10, "n"), LongType, 137L) == Some("130"))
    assert(one(Truncate(10, "n"), LongType, -7L) == Some("-10")) // floor, not trunc
    assert(one(Bucket(4, "k"), LongType, 42L).exists(s => (0 to 3).map(_.toString).contains(s)))
  }

  test("truncate(2,s): prefix partitioning serves point lookups and ranges") {
    val df = Seq("aa1", "aa2", "ab1", "ba1", "bb7", "bb9")
      .zipWithIndex.map { case (s, i) => (s, i.toLong) }.toDF("s", "n")
    val t = GraftTable.create(spark, tmp(), df.repartition(1),
      partitionBy = Seq("truncate(2,s)"))
    assert(t.filesAt(t.version).count(_.rows > 0) == 4) // aa ab ba bb
    assert(t.scanCandidates($"s" === "bb9", t.version).size == 1)
    assert(t.scan($"s" === "bb9").select("n").as[Long].collect().toSeq == Seq(5L))
    assert(t.scan($"s" >= "ab").count() == 4L)
  }

  test("identity tables keep the legacy log encoding; transform logs are lists") {
    val idLoc = tmp()
    val tId = GraftTable.create(spark, idLoc,
      Seq((1L, "a")).toDF("k", "s"), partitionBy = Seq("s"))
    assert(tId.scan($"k" === 1L).count() == 1)
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(idLoc, "_graft_log", "00000000000000000001.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(raw.contains(""""partitionBy":"s""""),
      s"identity encoding must stay the legacy comma string; got: $raw")
    val trLoc = tmp()
    GraftTable.create(spark, trLoc, Seq((1L, "a")).toDF("k", "s"),
      partitionBy = Seq("bucket(2,k)", "s"))
    val raw2 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(trLoc, "_graft_log", "00000000000000000001.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(raw2.contains(""""partitionBy":["bucket(2,k)","s"]"""),
      s"transform encoding must be a JSON list; got: $raw2")
    // at() round-trips both; mixed specs prune on both faces
    val t2 = GraftTable.at(spark, trLoc)
    assert(t2.partitionBy == Seq("bucket(2,k)", "s"))
    assert(t2.scan($"k" === 1L && $"s" === "a").count() == 1)
  }

  test("definition validation is loud: bad types, bad columns, drop/rename guards") {
    val df = Seq((1L, "a", 1.5)).toDF("k", "s", "f")
    intercept[IllegalArgumentException](
      GraftTable.create(spark, tmp(), df, partitionBy = Seq("days(k)")))
    intercept[IllegalArgumentException](
      GraftTable.create(spark, tmp(), df, partitionBy = Seq("bucket(4,f)")))
    intercept[IllegalArgumentException](
      GraftTable.create(spark, tmp(), df, partitionBy = Seq("bucket(4,nope)")))
    intercept[IllegalArgumentException](
      GraftTable.create(spark, tmp(), df, partitionBy = Seq("truncate(2,s)", "truncate(2,s)")))
    val t = GraftTable.create(spark, tmp(), df, partitionBy = Seq("bucket(4,k)"))
    intercept[Exception](t.dropColumn("k"))   // partition SOURCE column
    intercept[Exception](t.renameColumn("k", "k2"))
    t.renameColumn("s", "s2") // non-source columns stay renamable
    assert(GraftTable.at(spark, t.location.toString).schema.fieldNames.contains("s2"))
  }

  test("snapshotWhere stays identity-only and says why") {
    val t = GraftTable.create(spark, tmp(),
      Seq((1L, "a")).toDF("k", "s"), partitionBy = Seq("bucket(4,k)"))
    val e = intercept[IllegalArgumentException](
      t.snapshotWhere($"k" === 1L).collect())
    assert(e.getMessage.contains("scan"), s"want a pointer to scan(): ${e.getMessage}")
  }

  test("write distribution: a 16-task append lands one file per partition cell") {
    val df = (0L until 160L).map(i => (i, s"c${i % 3}")).toDF("k", "p").repartition(16)
    val t = GraftTable.create(spark, tmp(), df.limit(0), partitionBy = Seq("p"))
    t.append(df)
    // without the rebalance-on-cell write distribution this would be up to
    // 16 tasks x 3 cells = 48 files; with it, one file per cell
    val files = t.filesAt(t.version).filter(_.rows > 0)
    assert(files.size == 3, s"expected one file per cell, got ${files.size}")
    assert(t.snapshot().count() == 160L)
    // optimize keeps its own layout (distribute=false path) and stays green
    t.optimize(Seq("k"), targetBytes = 1L << 20)
    assert(t.snapshot().count() == 160L)
  }

  test("partition evolution: spec changes forward, old files stay exact, optimize migrates") {
    val loc = tmp()
    // parity-interleaved eras: era 1 = even keys, era 2 = odd keys, both
    // spanning [0, 80) — zone maps cannot tell the eras apart, isolating
    // the evolution semantics
    def rows(ks: Seq[Long]) = ks.map(i => (i, s"r${(i / 2) % 2}", i * 10))
      .toDF("k", "r", "n")
    val era1 = rows(0L until 80L by 2)
    val t1 = GraftTable.create(spark, loc, era1.repartition(1),
      partitionBy = Seq("r"))
    assert(t1.filesAt(t1.version).count(_.rows > 0) == 2) // r0 r1
    // evolve to bucket(4,k); the OLD handle becomes write-stale — loud
    t1.setPartitioning(Seq("bucket(4,k)"))
    val e = intercept[IllegalArgumentException](
      t1.append(Seq((100L, "r0", 0L)).toDF("k", "r", "n")))
    assert(e.getMessage.contains("stale table handle"), e.getMessage)
    val t2 = GraftTable.at(spark, loc)
    assert(t2.partitionBy == Seq("bucket(4,k)"))
    t2.append(rows(1L until 80L by 2).repartition(1)) // 4 bucket files
    // reads span both eras exactly
    assert(t2.snapshot().count() == 80L)
    assert(t2.scan($"k" === 7L).select("n").as[Long].collect().toSeq == Seq(70L))
    assert(t2.scan($"k" === 54L).select("n").as[Long].collect().toSeq == Seq(540L))
    // bucket pruning admits era-1 files unconditionally (no bucket key)
    // and exactly one era-2 file: 2 + 1
    assert(t2.scanCandidates($"k" === 55L, t2.version).size == 3)
    // snapshotWhere on the CURRENT identity-free spec is rejected; after
    // evolving to identity it keeps pre-evolution rows (conservative read)
    t2.setPartitioning(Seq("r"))
    val t3 = GraftTable.at(spark, loc)
    assert(t3.snapshotWhere($"r" === "r1").count() == 40L)
    // replacePartitions refuses while unmigrated files remain, then works
    // after optimize() migrates everything to the current spec
    val r = intercept[IllegalArgumentException](
      t3.replacePartitions(Seq((1000L, "r1", 1L)).toDF("k", "r", "n")))
    assert(r.getMessage.contains("optimize"), r.getMessage)
    t3.optimize(Seq("k"), targetBytes = 1L << 20)
    assert(t3.currentFiles.filter(_.rows > 0).forall(_.pv.contains("r")))
    t3.replacePartitions(Seq((1000L, "r1", 1L)).toDF("k", "r", "n"))
    assert(t3.snapshot().where($"r" === "r1").count() == 1L)
    assert(t3.snapshot().where($"r" === "r0").count() == 40L)
    // time travel still serves every pre-evolution version
    assert(t3.snapshot(Some(1L)).count() == 40L)
  }

  test("CALL graft.system.set_partitioning evolves the spec through SQL") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pt-cat").toString
    spark.conf.set("spark.sql.catalog.gpt", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gpt.root", dir)
    spark.sql("CREATE TABLE gpt.evo (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gpt.evo SELECT id, concat('a', id) FROM range(0, 10, 1, 1)")
    spark.sql("CALL gpt.system.set_partitioning(table => 'evo', specs => 'bucket(4,k)')")
    spark.sql("INSERT INTO gpt.evo SELECT id, concat('b', id) FROM range(10, 50, 1, 1)")
    val t = GraftTable.at(spark, s"$dir/evo")
    assert(t.partitionBy == Seq("bucket(4,k)"))
    assert(t.currentFiles.count(f => f.rows > 0 && f.pv.contains("bucket(4,k)")) == 4)
    assert(spark.sql("SELECT count(*) FROM gpt.evo WHERE k = 37").head().getLong(0) == 1L)
    assert(spark.sql("SELECT count(*) FROM gpt.evo").head().getLong(0) == 50L)
  }

  test("merge on a bucketed key prunes candidates to the source's buckets") {
    val base = (0L until 100L).map(i => (i, i * 10)).toDF("k", "n")
    val t = GraftTable.create(spark, tmp(), base.limit(0),
      keyCol = Some("k"), partitionBy = Seq("bucket(4,k)"))
    t.append(base.repartition(1)) // 4 bucket files, each spanning the key range
    // a one-key source admits exactly its bucket's file: key-RANGE stats
    // keep all 4 (hash spread), the bucket prune keeps 1
    val src = Seq((55L, 999L)).toDF("k", "n")
    assert(t.mergeCandidateFiles(src, None).size == 1,
      "bucket prune did not narrow the merge candidates")
    t.mergeInto(src,
      matched = Seq((None, Some(Map("n" -> col("__src_n"))))),
      notMatched = Seq((None, Map("k" -> col("__src_k"), "n" -> col("__src_n")))))
    assert(t.snapshot().where($"k" === 55L).select("n").as[Long].head() == 999L)
    assert(t.snapshot().count() == 100L)
    // the merge rewrote only the pruned candidate's bucket
    assert(t.history.last.op == "merge")
  }

  test("replacePartitions replaces whole transform partitions") {
    val t = GraftTable.create(spark, tmp(),
      Seq((1L, "old-a"), (2L, "old-b"), (11L, "old-c")).toDF("k", "s")
        .repartition(1), partitionBy = Seq("truncate(10,k)"))
    // decade 0 gets replaced wholesale; decade 10 untouched
    t.replacePartitions(Seq((3L, "new")).toDF("k", "s"))
    val got = t.snapshot().as[(Long, String)].collect().toSet
    assert(got == Set((3L, "new"), (11L, "old-c")))
  }
}
