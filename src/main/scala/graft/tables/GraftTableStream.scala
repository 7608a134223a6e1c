package graft.tables

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** Structured Streaming READ face of [[GraftTable]] — the table as a
  * micro-batch source, completing the incremental loop the write side
  * already has (`appendIfAbsent` = exactly-once sink):
  * stream → table → stream.
  *
  * Offsets are TABLE VERSIONS (one Long — the commit log is already a
  * totally-ordered stream of file actions, so the source needs no listing,
  * no watermark, no boundary set: a batch is exactly the files the commits
  * in `(start, end]` added). Append-only contract like the published
  * lakehouse sources: a commit that REMOVES files (overwrite / merge /
  * delete / compaction / replacePartitions) fails the stream loud, or is
  * skipped wholesale with `skipChangeCommits=true` (the Delta option's
  * semantics — downstream sees only whole appended commits either way).
  *
  * Scale: `planInputPartitions` is O(commits in range) driver work reading
  * only log JSON; each added file becomes one input partition read on an
  * executor. Readers decode parquet via parquet-mr's example API —
  * supported for FLAT atomic schemas (integral, string, double/float,
  * boolean, date, binary), which is checked LOUD at stream construction;
  * nested/decimal/timestamp tables use batch `changes()` instead.
  *
  * Usage: `table.readStream` or
  * `spark.readStream.format("graft-table").option("path", loc).load()`.
  * Options: `startingVersion` (default 0 = include the create commit's
  * rows), `skipChangeCommits` (default false).
  */
final class GraftTableStreamSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-table"

  private def location(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-table source needs .option(\"path\", ...)")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftTable.at(SparkSession.active, location(options)).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftTableStreamTable(location(new CaseInsensitiveStringMap(properties)), schema)

  override def supportsExternalMetadata(): Boolean = false
}

private[tables] final class GraftTableStreamTable(location: String, tableSchema: StructType)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graft-table($location)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = tableSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new GraftTableMicroBatchStream(location, tableSchema, options)
        override def description(): String = s"graft-table stream ($location)"
      }
    }
  // `writeStream.format("graft-table").option("path", ...)` — the
  // exactly-once epoch-commit sink, symmetric with the read face
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.Write {
          override def toStreaming
              : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
            val gt = GraftTable.at(SparkSession.active, location)
            require(gt.partitionBy.isEmpty, "streaming writes to a " +
              "PARTITIONED graft table are not supported; use foreachBatch")
            // the stream's schema must be the table's (names + types;
            // nullability free) — a silent column permutation would corrupt
            val in = info.schema()
            require(in.fields.map(f => (f.name, f.dataType)).toSeq ==
              gt.schema.fields.map(f => (f.name, f.dataType)).toSeq,
              s"stream schema ${in.simpleString} does not match table " +
                s"schema ${gt.schema.simpleString}")
            new GraftStreamingWrite(location, gt.schema, info.queryId())
          }
        }
    }
}

private[tables] final class GraftTableMicroBatchStream(
    location: String, schema: StructType, options: CaseInsensitiveStringMap)
  extends MicroBatchStream {

  GraftParquetReaderFactory.requireSupported(schema)

  private val spark = SparkSession.active
  private val confSer = new SerializableConfiguration(spark.sessionState.newHadoopConf())
  private def table: GraftTable = GraftTable.at(spark, location)

  private val startingVersion: Long =
    Option(options.get("startingversion")).map(_.toLong).getOrElse(0L)
  private val skipChangeCommits: Boolean =
    Option(options.get("skipchangecommits")).exists(_.toBoolean)

  override def initialOffset(): Offset = GraftVersionOffset(startingVersion)
  override def latestOffset(): Offset = GraftVersionOffset(table.version)
  override def deserializeOffset(json: String): Offset =
    GraftVersionOffset(json.trim.toLong)

  /** The batch is every file ADDED by commits in `(start, end]`. */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftVersionOffset].version
    val e = end.asInstanceOf[GraftVersionOffset].version
    val t = table
    (s + 1 to e).flatMap { v =>
      val (meta, adds, removes) = t.commitActions(v)
      if (removes.nonEmpty) {
        if (!skipChangeCommits) throw new IllegalStateException(
          s"streaming read hit a non-append commit at version $v " +
            s"(op=${meta.getOrElse("op", "?")}, ${removes.size} file(s) removed); " +
            "the table-as-stream contract is append-only — restart from a " +
            "later startingVersion, or set skipChangeCommits=true to skip " +
            "such commits wholesale")
        Seq.empty
      } else adds.map(a =>
        GraftFilePartition(new Path(location, a.path).toString): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftParquetReaderFactory(confSer, schema)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[tables] final case class GraftVersionOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

private[tables] final case class GraftFilePartition(path: String) extends InputPartition

/** Executor-side parquet decode through parquet-mr's Group API, schema
  * columns resolved BY NAME (files written before a schema evolution
  * null-fill the columns they predate — same by-name contract as the batch
  * reads). Flat atomic types only, checked loud at stream construction.
  */
private[tables] final class GraftParquetReaderFactory(
    confSer: SerializableConfiguration, schema: StructType)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftFilePartition]
    new PartitionReader[InternalRow] {
      private val reader: ParquetReader[Group] = {
        val support = new GroupReadSupport()
        @annotation.nowarn("cat=deprecation")
        val b = ParquetReader.builder(support, new Path(p.path)).withConf(confSer.value)
        b.build()
      }
      private var current: Group = _
      override def next(): Boolean = { current = reader.read(); current != null }
      override def get(): InternalRow = GraftParquetReaderFactory.toRow(current, schema)
      override def close(): Unit = reader.close()
    }
  }
}

private[tables] object GraftParquetReaderFactory {

  def requireSupported(schema: StructType): Unit = {
    val bad = schema.fields.filterNot(f => supported(f.dataType))
    require(bad.isEmpty,
      s"graft-table streaming read supports flat atomic schemas only; " +
        s"unsupported column(s): ${bad.map(f => s"${f.name}: ${f.dataType.simpleString}")
          .mkString(", ")} — use batch changes()/snapshot() for this table")
  }

  private def supported(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | DoubleType |
         FloatType | BooleanType | StringType | DateType | BinaryType => true
    case _ => false
  }

  def toRow(g: Group, schema: StructType): InternalRow = {
    val gt = g.getType
    val values = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      val f = schema.fields(i)
      values(i) =
        if (!gt.containsField(f.name)) null // pre-evolution file: null-fill
        else {
          val idx = gt.getFieldIndex(f.name)
          if (g.getFieldRepetitionCount(idx) == 0) null
          else f.dataType match {
            case LongType => g.getLong(idx, 0)
            case IntegerType | DateType => g.getInteger(idx, 0)
            case ShortType => g.getInteger(idx, 0).toShort
            case ByteType => g.getInteger(idx, 0).toByte
            case DoubleType => g.getDouble(idx, 0)
            case FloatType => g.getFloat(idx, 0)
            case BooleanType => g.getBoolean(idx, 0)
            case StringType => UTF8String.fromBytes(g.getBinary(idx, 0).getBytes)
            case BinaryType => g.getBinary(idx, 0).getBytes
            case other => throw new IllegalStateException(
              s"unreachable: unsupported type $other passed requireSupported")
          }
        }
      i += 1
    }
    new GenericInternalRow(values)
  }
}
