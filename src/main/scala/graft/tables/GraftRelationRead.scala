package graft.tables

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.BucketSpec
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.graftbridge.GraftPlanBridge
import org.apache.spark.sql.types.StructType

/** Assemble a snapshot read as a native file-source relation over the
  * commit log's metadata ([[GraftFileIndex]]) instead of
  * `spark.read.parquet(paths…)`. Three things the path-list read cannot
  * express become available:
  *
  *   - NO per-query filesystem listing: lengths come from the log.
  *   - A [[BucketSpec]] when the table is bucket-partitioned and every
  *     selected file is bucket-pure: the scan reports
  *     `HashPartitioning(col, n)` — the EXACT partitioning
  *     `bucket(n,col)`'s shadow expression (`pmod(hash(col), n)`,
  *     [[PartitionTransforms.Bucket]]) wrote the files under, because it
  *     IS Spark's `HashPartitioning.partitionIdExpression` — so joins of
  *     co-bucketed tables and aggregations on the bucket column plan with
  *     ZERO exchanges. At 100 TB that removes the dominant shuffle of
  *     every repeated fact-to-fact join.
  *   - Identity partition columns as REAL partition columns (Catalyst
  *     partition filters + dynamic partition pruning), grouped per tuple.
  *
  * Everything downstream (vectorized parquet read, predicate pushdown,
  * column pruning, whole-stage codegen) is Spark's own `FileSourceScanExec`
  * — the same physical machinery `spark.read.parquet` plans, minus the
  * listing.
  */
private[tables] object GraftRelationRead {

  /** `(qualified path, exact length)` per file → DataFrame under `phys`. */
  def frame(spark: SparkSession,
      root: Path,
      groups: Seq[(InternalRow, Seq[(Path, Long)])],
      partitionSchema: StructType,
      phys: StructType,
      bucket: Option[BucketSpec]): DataFrame = {
    val grouped = groups.map { case (row, files) =>
      row -> files.map { case (p, len) =>
        // synthetic block size / mtime: split planning uses only the
        // length; the engine never reads file_modification_time
        new FileStatus(len, false, 1, 128L << 20, 0L, p)
      }.toArray
    }
    val index = new GraftFileIndex(root, grouped, partitionSchema)
    // `spark.read.schema(…)` forces the read schema nullable (file data is
    // never trusted to be non-null); the relation must claim the same or
    // codegen would read a parquet null through a non-nullable LongType as
    // 0 instead of null
    val relation = HadoopFsRelation(index, partitionSchema,
      asNullable(phys).asInstanceOf[StructType], bucket,
      new ParquetFileFormat(), Map.empty[String, String])(spark)
    GraftPlanBridge.ofRows(spark, LogicalRelation(relation, isStreaming = false))
  }

  private def asNullable(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(dataType = asNullable(f.dataType), nullable = true)))
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = asNullable(a.elementType), containsNull = true)
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(valueType = asNullable(m.valueType), valueContainsNull = true)
    case other => other
  }
}
