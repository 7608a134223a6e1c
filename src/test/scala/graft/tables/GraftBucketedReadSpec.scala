package graft.tables

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The log-backed read path ([[GraftFileIndex]] / [[GraftRelationRead]]):
  * snapshot scans plan from commit-log metadata (no filesystem listing),
  * and bucket-partitioned tables prove their layout to the planner —
  * co-bucketed joins and bucket-key aggregations run with ZERO exchanges,
  * the dominant shuffle of repeated fact-to-fact joins at 100 TB.
  */
class GraftBucketedReadSpec extends SparkTestBase {

  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-bucketed").resolve("t").toString

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize AQE
    df.queryExecution.executedPlan.toString()
  }

  test("snapshot plans over the log-backed file index, not a listed one") {
    val t = GraftTable.create(spark, tmp(),
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val scans = t.snapshot().queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a FileSourceScanExec")
    assert(scans.forall(_.relation.location.isInstanceOf[GraftFileIndex]),
      s"scan not log-backed: ${scans.map(_.relation.location.getClass)}")
    assert(t.snapshot().as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
  }

  test("bucket files carry the bucket id in their name, matching the log") {
    val t = GraftTable.create(spark, tmp(),
      (1L to 200L).map(i => (i, s"v$i")).toDF("k", "v").repartition(4),
      partitionBy = Seq("bucket(8,k)"))
    t.append((201L to 300L).map(i => (i, s"v$i")).toDF("k", "v"))
    val files = t.currentFiles
    assert(files.nonEmpty)
    files.foreach { f =>
      val logged = f.pv.get("bucket(8,k)").flatten.map(_.toInt)
      val named = GraftTable.bucketIdFromName(f.path)
      assert(logged.isDefined && named == logged,
        s"${f.path}: name id $named vs logged $logged")
    }
  }

  test("co-bucketed join plans with zero exchanges and the right rows") {
    val left = GraftTable.create(spark, tmp(),
      (1L to 500L).map(i => (i, i * 2)).toDF("k", "a").repartition(4),
      partitionBy = Seq("bucket(8,k)"))
    val right = GraftTable.create(spark, tmp(),
      (250L to 750L).map(i => (i, i * 3)).toDF("k", "b").repartition(4),
      partitionBy = Seq("bucket(8,k)"))
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = left.snapshot().join(right.snapshot(), "k")
        .agg(count(lit(1)).as("n"), sum($"a" + $"b").as("s"))
      val plan = executedPlan(j)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning(k"),
        s"co-bucketed join must not reshuffle its inputs:\n$plan")
      val row = j.collect().head
      assert(row.getLong(0) == 251L)
      assert(row.getLong(1) == (250L to 500L).map(i => i * 5).sum)
    }
  }

  test("aggregation on the bucket column plans with zero exchanges") {
    val t = GraftTable.create(spark, tmp(),
      (1L to 400L).map(i => (i % 40, i)).toDF("k", "n").repartition(4),
      partitionBy = Seq("bucket(8,k)"))
    val agg = t.snapshot().groupBy($"k").agg(sum($"n").as("s"))
    val plan = executedPlan(agg)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucket-key aggregation must not shuffle:\n$plan")
    val got = agg.as[(Long, Long)].collect().toMap
    val want = (1L to 400L).groupBy(_ % 40).view.mapValues(_.sum).toMap
    assert(got == want)
  }

  test("files that predate the bucket spec disable the claim, not the read") {
    val loc = tmp()
    val t0 = GraftTable.create(spark, loc,
      (1L to 100L).map(i => (i, i)).toDF("k", "n").repartition(2))
    t0.setPartitioning(Seq("bucket(4,k)"))
    val t = GraftTable.at(spark, loc) // partitioning changed: re-open
    t.append((101L to 200L).map(i => (i, i)).toDF("k", "n"))
    // mixed layout: pre-spec files have no bucket pv — no HashPartitioning
    // claim may be made, so the bucket-key aggregation must still shuffle
    val agg = t.snapshot().groupBy($"k").agg(sum($"n").as("s"))
    val plan = executedPlan(agg)
    assert(plan.contains("Exchange hashpartitioning"),
      s"mixed pre-spec layout must not claim bucketing:\n$plan")
    assert(agg.collect().length == 200)
  }

  test("identity partition columns prune inside the planner") {
    val t = GraftTable.create(spark, tmp(),
      Seq((1L, "A", 10L), (2L, "A", 20L), (3L, "B", 30L), (4L, "C", 40L))
        .toDF("k", "part", "n").repartition(4),
      partitionBy = Seq("part"))
    val q = t.snapshot().where($"part" === "B")
    val scans = { q.collect(); q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f } }
    assert(scans.nonEmpty)
    // the predicate classified as a PARTITION filter and pruned to B's
    // files without reading a footer — the planner did snapshotWhere's job
    assert(scans.head.partitionFilters.nonEmpty,
      s"expected partition filters, got data-only: ${scans.head.metadata}")
    val bFiles = t.currentFiles
      .filter(_.pv.get("part").contains(Some("B"))).size
    assert(scans.head.inputRDDs().map(_.getNumPartitions).sum <= bFiles.max(1))
    assert(q.as[(Long, String, Long)].collect().toSet == Set((3L, "B", 30L)))
  }

  test("partition values substitute exactly: special chars, nulls, dates") {
    val rows = Seq(
      (1L, Some("a b=c/d%e"), Some(java.sql.Date.valueOf("2024-02-29")), Some(7L)),
      (2L, Some("unié中"), Some(java.sql.Date.valueOf("1969-12-31")), None),
      (3L, None, None, Some(-5L)))
    val df = rows.toDF("k", "s", "d", "i")
    // partition by the string+date+int trio; string has a NULL partition →
    // strings fall back (Hive token conflates null/""), but date and int
    // stay exposed — either way every value must round-trip bit-exactly
    val t = GraftTable.create(spark, tmp(), df.repartition(2),
      partitionBy = Seq("d", "i"))
    val got = t.snapshot().select($"k", $"s", $"d", $"i")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.getDate(2)), if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toSet
    assert(got == rows.map(r => (r._1, r._2, r._3, r._4)).toSet)
    // and a string-partitioned table with the empty string falls back to
    // data columns (no substitution) yet reads "" not null
    val t2 = GraftTable.create(spark, tmp(),
      Seq((1L, ""), (2L, "x")).toDF("k", "s"), partitionBy = Seq("s"))
    assert(t2.snapshot().where($"s" === "").select($"k")
      .as[Long].collect().toSeq == Seq(1L))
  }

  test("dynamic partition pruning fires from a filtered dimension join") {
    val fact = GraftTable.create(spark, tmp(),
      (1L to 400L).map(i => (i, i % 8, i * 2)).toDF("k", "pid", "n")
        .repartition(4),
      partitionBy = Seq("pid"))
    // the dim must be file-backed: a LocalRelation constant-folds its
    // filter away before the PartitionPruning rule looks for one
    val dimDir = Files.createTempDirectory("graft-dpp-dim").toString + "/d"
    (0L to 7L).map(i => (i, if (i == 3) "keep" else "drop"))
      .toDF("pid", "tag").write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    withSQLConf(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "1048576") {
      val q = fact.snapshot().join(dim, "pid").where($"tag" === "keep")
        .agg(sum($"n").as("s"))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString()
      assert(plan.contains("dynamicpruning"),
        s"expected a dynamic partition pruning filter in:\n$plan")
      assert(q.as[Long].collect().head ==
        (1L to 400L).filter(_ % 8 == 3).map(_ * 2).sum)
    }
  }

  test("deletion vectors keep bucketed reads exact") {
    val t = GraftTable.create(spark, tmp(),
      (1L to 300L).map(i => (i, i)).toDF("k", "n").repartition(4),
      partitionBy = Seq("bucket(8,k)"))
    t.deleteWhere($"k" % 3 === 0) // sparse: lands as DVs where possible
    val got = t.snapshot().groupBy($"k").agg(sum($"n").as("s"))
      .as[(Long, Long)].collect().toMap
    val want = (1L to 300L).filterNot(_ % 3 == 0).map(i => i -> i).toMap
    assert(got == want)
  }
}
