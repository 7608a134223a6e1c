package graft.tables

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** Commit-log-backed [[FileIndex]]: the table's read plan is assembled
  * ENTIRELY from log metadata — file paths and exact byte lengths ride in
  * every `AddFile` — so planning a snapshot scan performs ZERO filesystem
  * listing or per-file `getFileStatus` calls. `spark.read.parquet(paths…)`
  * stats every path on the driver before each query; on an object store at
  * 100 TB (10⁵–10⁶ files) that is 10⁵–10⁶ round trips per query, and it is
  * exactly what the log already knows. This is the published lakehouse
  * file-index design (Delta's log-backed index; Armbrust et al., VLDB 2020
  * §4.2 — metadata in the log, not the namespace).
  *
  * `groups` carries the files pre-grouped by partition-value tuple (one
  * group with an empty row when `partitionSchema` is empty). A non-empty
  * `partitionSchema` exposes the table's identity partition columns as REAL
  * partition columns to Catalyst: `FileSourceStrategy` splits predicates
  * into partition filters (evaluated here, on the driver, against the
  * O(partitions) grouped tuples — files of refuted partitions are never
  * planned) and data filters (pushed to parquet), and Spark's own
  * dynamic-partition-pruning rule can inject RUNTIME filters from a joined
  * dimension — the star-schema prune at 100 TB. Evaluation uses Catalyst's
  * compiled predicate on the typed partition rows, so null/cast semantics
  * match a post-scan `.where` exactly.
  *
  * Block size / modification time are synthetic (the log does not record
  * them): parquet split planning uses only the byte length, and the engine
  * never surfaces `_metadata.file_modification_time`.
  */
final class GraftFileIndex(
    root: Path,
    groups: Seq[(InternalRow, Array[FileStatus])],
    override val partitionSchema: StructType) extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(root)

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept =
      if (partitionFilters.isEmpty || partitionSchema.isEmpty) groups
      else {
        // bind the filter's attribute references to partition-row ordinals
        // by (case-insensitive) name and evaluate per group — the standard
        // partition-pruning evaluation every file index performs
        val bound = partitionFilters.reduce(And).transform {
          case a: AttributeReference =>
            val i = partitionSchema.fieldNames
              .indexWhere(_.equalsIgnoreCase(a.name))
            require(i >= 0,
              s"partition filter references non-partition column ${a.name}")
            BoundReference(i, partitionSchema.fields(i).dataType,
              nullable = true)
        }
        val pred = Predicate.create(bound, Nil)
        pred.initialize(0)
        groups.filter { case (row, _) => pred.eval(row) }
      }
    kept.map { case (row, fs) => PartitionDirectory(row, fs) }
  }

  override def inputFiles: Array[String] =
    groups.iterator.flatMap(_._2.iterator.map(_.getPath.toString)).toArray

  override def refresh(): Unit = ()

  override val sizeInBytes: Long =
    groups.iterator.flatMap(_._2.iterator.map(_.getLen)).sum
}
