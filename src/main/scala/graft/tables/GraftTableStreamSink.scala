package graft.tables

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

import GraftTable.AddFile

/** Native Structured Streaming SINK into a [[GraftTable]] — the write half
  * of the table-as-stream loop (`writeStream.toTable("graft.ns.t")` or
  * `.format("graft-table").option("path", ...)`), exactly-once without
  * `foreachBatch`:
  *
  *   - executors write each partition straight to an immutable
  *     `part-<uuid>.parquet` in the table root (invisible to every snapshot
  *     until a commit references it — the same invisibility discipline as
  *     the batch `writeData`, and the vacuum retention window keeps
  *     in-flight files safe);
  *   - the driver's epoch `commit` lands ONE log commit tagged
  *     `txn = <queryId>-epoch-<epochId>`, so a replayed epoch after a
  *     checkpoint restart is a no-op and a version race against unrelated
  *     writers retries until the epoch lands ([[GraftTable.commitFiles]]) —
  *     the `appendIfAbsent` exactly-once contract, natively in the sink;
  *   - `abort` deletes the files the failed epoch wrote.
  *
  * Executor-side rows are encoded through parquet-mr's example API — the
  * same FLAT ATOMIC schema contract as the streaming READ face, checked
  * loud at stream construction. Streaming-written files carry row counts
  * but no zone-map stats; `compact()`/`optimize()` rewrites re-derive full
  * stats through the batch path (so the operational answer to many small
  * stat-less streaming files is the same compaction the small-files
  * problem already demands).
  */
private[tables] final class GraftStreamingWrite(
    location: String, schema: StructType, queryId: String)
  extends StreamingWrite {

  GraftParquetReaderFactory.requireSupported(schema)

  private val confSer = new SerializableConfiguration(
    SparkSession.active.sessionState.newHadoopConf())

  // ONE driver-side handle for the whole query run: commit parses memoize
  // per GraftTable instance, so epoch N+1 replays only the commits landed
  // since epoch N (a fresh handle per epoch would re-read the entire log
  // each micro-batch — O(versions) files per epoch, O(n^2) cumulative on a
  // long-running stream). Lazy: built on the streaming thread at first use.
  @transient private lazy val table: GraftTable =
    GraftTable.at(SparkSession.active, location)

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftStreamWriterFactory(location, schema, confSer)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val adds = messages.toIndexedSeq.collect {
      case m: GraftFileCommitMessage if m.rows > 0 =>
        AddFile(m.path, m.rows, None, m.bytes)
    }
    // an empty epoch commits nothing and records nothing: replaying it
    // writes nothing either, so skipping keeps the log free of no-op
    // versions without weakening exactly-once
    if (adds.nonEmpty)
      table.commitFiles("streamingAppend", adds, Some(s"$queryId-epoch-$epochId"))
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(location).getFileSystem(confSer.value)
    messages.foreach {
      case m: GraftFileCommitMessage =>
        try fs.delete(new Path(location, m.path), false)
        catch { case _: java.io.IOException => () } // best-effort cleanup
      case _ => ()
    }
  }
}

private[tables] final case class GraftFileCommitMessage(
  path: String, rows: Long, bytes: Long) extends WriterCommitMessage

private[tables] final class GraftStreamWriterFactory(
    location: String, schema: StructType, confSer: SerializableConfiguration)
  extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftParquetDataWriter(location, schema, confSer)
}

/** One immutable parquet file per (partition, epoch) task attempt; empty
  * partitions still produce a file but the driver drops zero-row adds.
  * Speculative/retried attempts write under fresh UUIDs — losers are never
  * committed and age out through the vacuum retention window.
  */
private[tables] final class GraftParquetDataWriter(
    location: String, schema: StructType, confSer: SerializableConfiguration)
  extends DataWriter[InternalRow] {

  private val fileName = s"part-${UUID.randomUUID()}.parquet"
  private val filePath = new Path(location, fileName)
  private val parquetSchema = GraftParquetDataWriter.toParquetSchema(schema)
  private val factory = new SimpleGroupFactory(parquetSchema)
  private var rows = 0L

  private val writer = {
    @annotation.nowarn("cat=deprecation")
    val b = ExampleParquetWriter.builder(filePath)
      .withConf(confSer.value)
      .withType(parquetSchema)
    b.build()
  }

  override def write(row: InternalRow): Unit = {
    val g = factory.newGroup()
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) {
        val name = schema.fields(i).name
        schema.fields(i).dataType match {
          case LongType => g.append(name, row.getLong(i))
          case IntegerType | DateType => g.append(name, row.getInt(i))
          case ShortType => g.append(name, row.getShort(i).toInt)
          case ByteType => g.append(name, row.getByte(i).toInt)
          case DoubleType => g.append(name, row.getDouble(i))
          case FloatType => g.append(name, row.getFloat(i))
          case BooleanType => g.append(name, row.getBoolean(i))
          case StringType =>
            g.append(name, Binary.fromReusedByteArray(row.getUTF8String(i).getBytes))
          case BinaryType => g.append(name, Binary.fromReusedByteArray(row.getBinary(i)))
          case other => throw new IllegalStateException(
            s"unreachable: unsupported type $other passed requireSupported")
        }
      }
      i += 1
    }
    writer.write(g)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    val fs = filePath.getFileSystem(confSer.value)
    val bytes = fs.getFileStatus(filePath).getLen
    if (rows == 0L) fs.delete(filePath, false) // nothing to reference
    GraftFileCommitMessage(fileName, rows, bytes)
  }

  override def abort(): Unit = {
    try writer.close() catch { case _: Throwable => () }
    try filePath.getFileSystem(confSer.value).delete(filePath, false)
    catch { case _: java.io.IOException => () }
  }

  override def close(): Unit = ()
}

private[tables] object GraftParquetDataWriter {

  /** Flat atomic Spark schema → parquet message type, with the logical
    * annotations Spark's readers map back to the SAME Spark types (so a
    * stream-written file round-trips through `snapshot()` with the exact
    * table schema — int widths and date-ness preserved, not widened).
    */
  def toParquetSchema(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val fb = f.dataType match {
        case LongType => Types.optional(PrimitiveTypeName.INT64)
        case IntegerType => Types.optional(PrimitiveTypeName.INT32)
        case ShortType => Types.optional(PrimitiveTypeName.INT32)
          .as(LogicalTypeAnnotation.intType(16, true))
        case ByteType => Types.optional(PrimitiveTypeName.INT32)
          .as(LogicalTypeAnnotation.intType(8, true))
        case DateType => Types.optional(PrimitiveTypeName.INT32)
          .as(LogicalTypeAnnotation.dateType())
        case DoubleType => Types.optional(PrimitiveTypeName.DOUBLE)
        case FloatType => Types.optional(PrimitiveTypeName.FLOAT)
        case BooleanType => Types.optional(PrimitiveTypeName.BOOLEAN)
        case StringType => Types.optional(PrimitiveTypeName.BINARY)
          .as(LogicalTypeAnnotation.stringType())
        case BinaryType => Types.optional(PrimitiveTypeName.BINARY)
        case other => throw new IllegalArgumentException(
          s"graft-table streaming write supports flat atomic schemas only, got $other")
      }
      b.addField(fb.named(f.name))
    }
    b.named("graft")
  }
}
