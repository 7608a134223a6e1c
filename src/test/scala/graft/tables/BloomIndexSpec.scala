package graft.tables

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** File-level bloom filter index: parquet split-block bitsets written per
  * configured column, probed on the driver to refute point lookups — see
  * `BloomIndex`. The ids here are constructed so every file's [min, max]
  * RANGE overlaps every other's (zone maps cannot prune), isolating the
  * bloom refutation as the only possible pruner.
  */
class BloomIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    new java.io.File(Files.createTempDirectory("graft-bloom").toFile, "t").getAbsolutePath

  /** ids interleaved across batches: batch b of nBatches gets
    * "id%03d" for i ≡ b (mod nBatches) — each batch's string range spans
    * nearly the whole domain, so interval pruning keeps everything.
    */
  private def ids(batch: Int, nBatches: Int, n: Int): Seq[String] =
    (0 until n).map(i => f"id${i * nBatches + batch}%03d")

  /** Empty-create + per-batch appends, bloom index configured BEFORE any
    * data: every data file carries bitsets. coalesce(1) per append = one
    * file per batch (empty shuffle partitions write no file otherwise).
    */
  private def indexedTable(loc: String, nBatches: Int = 4, perBatch: Int = 25)
      : (GraftTable, Seq[Seq[String]]) = {
    val t = GraftTable.create(spark, loc,
      spark.emptyDataset[(String, Long)].toDF("id", "n"))
    t.setBloomFilter(Map("id" -> 1000L))
    val batches = (0 until nBatches).map(b => ids(b, nBatches, perBatch))
    batches.foreach { bs =>
      t.append(bs.map(s => (s, s.drop(2).toLong)).toDF("id", "n").coalesce(1))
    }
    (t, batches)
  }

  test("point lookup prunes to the one file holding the value (string)") {
    val (t, batches) = indexedTable(tmp())
    // the empty create contributes a zero-row file; data files = batches
    assert(t.filesAt(t.version).count(_.rows > 0) == batches.size)
    batches.foreach { bs =>
      val cands = t.scanCandidates(col("id") === bs(3), t.version)
      assert(cands.size == 1,
        s"expected exactly 1 candidate file for ${bs(3)}, got ${cands.size} " +
          "(zone maps cannot prune these interleaved ids — bloom must)")
      val got = t.scan(col("id") === bs(3)).select("n").as[Long].collect().toSeq
      assert(got == Seq(bs(3).drop(2).toLong))
    }
  }

  test("absent value prunes every file; present values are NEVER false-pruned") {
    val (t, batches) = indexedTable(tmp())
    assert(t.scanCandidates(col("id") === "zz999", t.version).isEmpty)
    assert(t.scan(col("id") === "zz999").count() == 0)
    // exhaustive sweep: every single row remains findable through the index
    batches.flatten.foreach { id =>
      assert(t.scan(col("id") === id).count() == 1, s"lost $id to a false prune")
    }
  }

  test("IN-list keeps exactly the files of its members") {
    val (t, batches) = indexedTable(tmp())
    val picks = Seq(batches(0)(1), batches(2)(7)) // two distinct files
    val cands = t.scanCandidates(col("id").isin(picks: _*), t.version)
    assert(cands.size == 2)
    assert(t.scan(col("id").isin(picks: _*)).count() == 2)
    // IN () can never match: vacuously prunes everything, returns nothing
    assert(t.scanCandidates(col("id").isin(), t.version).isEmpty)
  }

  test("long-typed column probes through the INT64 hash domain") {
    val loc = tmp()
    val t = GraftTable.create(spark, loc,
      spark.emptyDataset[(Long, String)].toDF("k", "v"))
    t.setBloomFilter(Map("k" -> 1000L))
    // interleaved longs: both files span [0, 99] — zone maps keep both
    t.append((0L until 100L by 2L).map(k => (k, s"v$k")).toDF("k", "v").coalesce(1))
    t.append((1L until 100L by 2L).map(k => (k, s"v$k")).toDF("k", "v").coalesce(1))
    assert(t.scanCandidates(col("k") === 42L, t.version).size == 1)
    assert(t.scanCandidates(col("k") === 43L, t.version).size == 1)
    assert(t.scan(col("k") === 42L).select("v").as[String].head() == "v42")
  }

  test("files written BEFORE the index have no bitset and are always kept") {
    val loc = tmp()
    val legacy = ids(0, 4, 25)
    val t = GraftTable.create(spark, loc,
      legacy.map(s => (s, s.drop(2).toLong)).toDF("id", "n").coalesce(1))
    t.setBloomFilter(Map("id" -> 1000L))
    t.append(ids(1, 4, 25).map(s => (s, s.drop(2).toLong)).toDF("id", "n").coalesce(1))
    // value only in the legacy file: indexed file refuted, legacy file kept
    val cands = t.scanCandidates(col("id") === legacy(5), t.version)
    assert(cands.size == 1)
    assert(t.scan(col("id") === legacy(5)).count() == 1)
    // an absent value INSIDE both files' [min, max] (zone maps keep both):
    // the indexed file bloom-refutes it, the legacy file stays unprovable
    assert(t.scanCandidates(col("id") === "id0405", t.version).size == 1)
  }

  test("index survives RENAME COLUMN (bitsets keyed by stable physical name)") {
    val (t, batches) = indexedTable(tmp())
    t.renameColumn("id", "doc_id")
    assert(t.bloomFilterColumns == Map("doc_id" -> 1000L))
    val cands = t.scanCandidates(col("doc_id") === batches(1)(4), t.version)
    assert(cands.size == 1)
    assert(t.scan(col("doc_id") === batches(1)(4)).count() == 1)
  }

  test("a bloom-pruned file is never OPENED: physically gone files don't fail the scan") {
    val (t, batches) = indexedTable(tmp())
    // physically delete the file holding batch 3 (simulates e.g. a
    // vacuumed clone source) — a scan for a batch-0 id must not touch it
    val victim = t.scanCandidates(col("id") === batches(3)(0), t.version)
    assert(victim.size == 1)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sessionState.newHadoopConf())
    assert(fs.delete(new org.apache.hadoop.fs.Path(t.location, victim.head.path), false))
    assert(t.scan(col("id") === batches(0)(0)).count() == 1)
    intercept[Exception] { // reading the gone file itself still fails loud
      t.scan(col("id") === batches(3)(0)).count()
    }
  }

  test("merge-on-read DELETE composes: deleted row absent despite a bloom hit") {
    val (t, batches) = indexedTable(tmp())
    val gone = batches(2)(9)
    t.deleteWhere(col("id") === gone)
    // the file survives with a deletion vector, its bitset still admits
    // the value — the DV anti-join removes the row, results stay exact
    assert(t.scan(col("id") === gone).count() == 0)
    assert(t.scan(col("id") === batches(2)(8)).count() == 1)
  }

  test("setBloomFilter validates: unknown column, bad type, bad ndv; clears with empty") {
    val t = GraftTable.create(spark, tmp(),
      Seq((1L, "a", 0.5)).toDF("k", "v", "score"))
    intercept[IllegalArgumentException] { t.setBloomFilter(Map("nope" -> 100L)) }
    intercept[IllegalArgumentException] { t.setBloomFilter(Map("score" -> 100L)) }
    intercept[IllegalArgumentException] { t.setBloomFilter(Map("k" -> 0L)) }
    t.setBloomFilter(Map("k" -> 100L, "v" -> 100L))
    assert(t.bloomFilterColumns.keySet == Set("k", "v"))
    t.setBloomFilter(Map.empty)
    assert(t.bloomFilterColumns.isEmpty)
  }

  test("config lifecycle: DROP COLUMN sheds its entry; REPLACE resets; clone carries") {
    val loc = tmp()
    val t = GraftTable.create(spark, loc, Seq((1L, "a", "x")).toDF("k", "v", "w"))
    t.setBloomFilter(Map("v" -> 100L, "w" -> 100L))
    t.dropColumn("w")
    assert(t.bloomFilterColumns == Map("v" -> 100L))
    val cloneLoc = tmp()
    val c = t.cloneTo(cloneLoc)
    assert(c.bloomFilterColumns == Map("v" -> 100L))
    t.replaceWith(Seq((1L, "z")).toDF("k", "v"))
    assert(t.bloomFilterColumns.isEmpty)
  }
}
