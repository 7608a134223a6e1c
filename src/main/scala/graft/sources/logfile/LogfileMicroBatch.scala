package graft.sources.logfile

import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.compress.CompressionCodecFactory
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** Streaming (micro-batch) face of the logfile source: each trigger scans the
  * input paths and emits records from files not seen by the previous offset —
  * the Structured Streaming analog of the batch reader, reusing the exact
  * same [[LogfilePartitionReader]] record-assembly core (SURVEY.md §7.3,
  * "streaming logfile source").
  *
  * Offsets are the sorted set of completed file paths (JSON array). Files are
  * assumed immutable once they appear (the standard file-stream contract);
  * a file is never re-read, and whole files arrive atomically per batch so
  * multiline records can't tear across triggers.
  */
final class LogfileMicroBatchStream(
    options: CaseInsensitiveStringMap,
    required: StructType)
  extends MicroBatchStream {

  private val spark = SparkSession.active
  private val confSer = new SerializableConfiguration(spark.sessionState.newHadoopConf())

  private def listFiles(): Seq[Path] = {
    val conf = confSer.value
    LogfileOptions.paths(options).flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val globbed = Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Seq.empty)
      globbed.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile) else Seq(st)
      }
    }.map(_.getPath)
      .filterNot { p => p.getName.startsWith("_") || p.getName.startsWith(".") }
      .sortBy(_.toString)
  }

  override def initialOffset(): Offset = LogfileSetOffset(Set.empty)

  override def latestOffset(): Offset =
    LogfileSetOffset(listFiles().map(_.toString).toSet)

  override def deserializeOffset(json: String): Offset = LogfileSetOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[LogfileSetOffset].paths
    val now = end.asInstanceOf[LogfileSetOffset].paths
    val fresh = (now -- seen).toSeq.sorted
    val codecs = new CompressionCodecFactory(confSer.value)
    fresh.map { p =>
      val path = new Path(p)
      val pattern = LogfileOptions.resolvePattern(options, path)
      // one partition per new file: whole-file for codec'd files by
      // necessity, and for plain files because a file must land in a single
      // batch anyway; intra-file split parallelism is a batch-side concern.
      LogfilePartition(p, 0L, Long.MaxValue, pattern)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LogfileReaderFactory(confSer, required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class LogfileSetOffset(paths: Set[String]) extends Offset {
  override def json(): String =
    paths.toSeq.sorted.map(p => "\"" + p.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")
}

object LogfileSetOffset {
  def fromJson(json: String): LogfileSetOffset = {
    val t = json.trim.stripPrefix("[").stripSuffix("]").trim
    if (t.isEmpty) LogfileSetOffset(Set.empty)
    else LogfileSetOffset(
      t.split("\",\\s*\"").map(_.stripPrefix("\"").stripSuffix("\"")
        .replace("\\\"", "\"").replace("\\\\", "\\")).toSet)
  }
}
