package graft.sources.logfile

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.JsonNodeFactory
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** Streaming (micro-batch) face of the logfile source: each trigger scans the
  * input paths and emits records from files that are new since the previous
  * offset — the Structured Streaming analog of the batch reader, reusing the
  * exact same [[LogfilePartitionReader]] record-assembly core (SURVEY.md
  * §7.3, "streaming logfile source").
  *
  * Offsets are a **(modification-time watermark, boundary set)** high-water
  * mark, not the set of every file ever seen: `watermark` is the largest
  * admitted mtime and `boundary` maps each admitted path *at* that watermark
  * (within `latenessMs` of it) to its mtime. A file is new iff its mtime is
  * past the watermark, or within the lateness window and not in the boundary.
  * Offset size is therefore bounded by the number of files sharing the
  * watermark window — it does NOT grow with the total files processed, so a
  * year-long directory stream keeps O(1) checkpoints. Serde is real Jackson
  * JSON, so any legal path (quotes, newlines, unicode) round-trips.
  *
  * Admission control: `maxFilesPerTrigger` caps each batch; files are
  * admitted in (mtime, path) order so the watermark only ever advances past
  * files that were admitted. `settleTimeMs` (default 0) delays admission
  * until a file's mtime has been stable for that long — a guard for
  * producers that write in place. The durable contract remains the standard
  * file-stream one: produce by write-then-rename (atomic), after which files
  * are immutable; a file back-dated to before `watermark - latenessMs` is
  * dropped (raise `latenessMs` for skewed producer clocks).
  */
final class LogfileMicroBatchStream(
    options: CaseInsensitiveStringMap,
    required: StructType)
  extends MicroBatchStream with SupportsAdmissionControl {

  private val spark = SparkSession.active
  private val confSer = new SerializableConfiguration(spark.sessionState.newHadoopConf())

  private val maxFilesPerTrigger: Option[Int] =
    Option(options.get("maxfilespertrigger")).map { v =>
      val n = v.toInt
      require(n > 0, s"maxFilesPerTrigger must be positive, got $n")
      n
    }
  private val latenessMs: Long =
    Option(options.get("latenessms")).map(_.toLong).getOrElse(0L)
  private val settleMs: Long =
    Option(options.get("settletimems")).map(_.toLong).getOrElse(0L)

  private def listFiles(): Seq[FileStatus] = {
    val conf = confSer.value
    LogfileOptions.paths(options).flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val globbed = Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Seq.empty)
      globbed.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile) else Seq(st)
      }
    }.filterNot { st =>
      val n = st.getPath.getName
      n.startsWith("_") || n.startsWith(".")
    }
  }

  override def initialOffset(): Offset = LogfileHwmOffset.Initial

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(n => ReadLimit.maxFiles(n)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead (SupportsAdmissionControl)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = LogfileHwmOffset.of(start)
    val cap = limit match {
      case m: ReadMaxFiles => m.maxFiles()
      case _ => Int.MaxValue
    }
    val settledBefore = System.currentTimeMillis() - settleMs
    val candidates = listFiles()
      .filter(st => s.isNew(st.getPath.toString, st.getModificationTime, latenessMs))
      .sortBy(st => (st.getModificationTime, st.getPath.toString))
    // settle gate cuts in admission order, never past it: admitting a newer
    // file while an older one is still unsettled would advance the watermark
    // over the gated file and drop it once it settles
    val settled =
      if (settleMs <= 0) candidates
      else candidates.takeWhile(_.getModificationTime <= settledBefore)
    val admitted = settled.take(cap)
    if (admitted.isEmpty) s else s.advance(admitted, latenessMs)
  }

  override def reportLatestOffset(): Offset =
    latestOffset(LogfileHwmOffset.Initial, ReadLimit.allAvailable())

  override def deserializeOffset(json: String): Offset = LogfileHwmOffset.fromJson(json)

  /** The batch is every currently-listed file that is new w.r.t. `start` and
    * not new w.r.t. `end`. Under the immutable/monotone-mtime contract this
    * is exactly the set admitted when `end` was computed, so replays after a
    * failure rebuild the same batch.
    */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = LogfileHwmOffset.of(start)
    val e = LogfileHwmOffset.of(end)
    listFiles()
      .filter { st =>
        val p = st.getPath.toString
        val m = st.getModificationTime
        s.isNew(p, m, latenessMs) && !e.isNew(p, m, latenessMs)
      }
      .sortBy(_.getPath.toString)
      .map { st =>
        val path = st.getPath
        val pattern = LogfileOptions.resolvePattern(options, path)
        // one partition per new file: whole-file for codec'd files by
        // necessity, and for plain files because a file must land in a single
        // batch anyway; intra-file split parallelism is a batch-side concern.
        LogfilePartition(path.toString, 0L, Long.MaxValue, pattern)
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LogfileReaderFactory(confSer, required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** High-water-mark offset: `watermark` = largest admitted mtime; `boundary` =
  * admitted paths with mtime within the lateness window of the watermark
  * (path → mtime, so the window can be re-pruned as the watermark advances).
  */
final case class LogfileHwmOffset(watermark: Long, boundary: Map[String, Long])
    extends Offset {

  /** New = strictly past the watermark, or inside the lateness window and not
    * yet admitted. Older than the window ⇒ dropped by contract.
    */
  def isNew(path: String, mtime: Long, latenessMs: Long): Boolean =
    mtime > watermark || (mtime >= watermark - latenessMs && !boundary.contains(path))

  def advance(admitted: Seq[FileStatus], latenessMs: Long): LogfileHwmOffset = {
    val newWm = math.max(watermark, admitted.map(_.getModificationTime).max)
    val merged = boundary ++ admitted.map(st => st.getPath.toString -> st.getModificationTime)
    LogfileHwmOffset(newWm, merged.filter(_._2 >= newWm - latenessMs))
  }

  override def json(): String = {
    val root = JsonNodeFactory.instance.objectNode()
    root.put("watermark", watermark)
    val b = root.putObject("boundary")
    boundary.toSeq.sortBy(_._1).foreach { case (p, m) => b.put(p, m) }
    LogfileHwmOffset.Mapper.writeValueAsString(root)
  }
}

object LogfileHwmOffset {
  private[logfile] val Mapper = new ObjectMapper()

  /** Nothing admitted yet: every listed file is new. */
  val Initial: LogfileHwmOffset = LogfileHwmOffset(Long.MinValue, Map.empty)

  def of(o: Offset): LogfileHwmOffset = o match {
    case h: LogfileHwmOffset => h
    case other => fromJson(other.json())
  }

  def fromJson(json: String): LogfileHwmOffset = {
    val root = Mapper.readTree(json)
    val wm = root.get("watermark").asLong()
    val b = root.get("boundary")
    val entries = b.properties().asScala.map(e => e.getKey -> e.getValue.asLong()).toMap
    LogfileHwmOffset(wm, entries)
  }
}
