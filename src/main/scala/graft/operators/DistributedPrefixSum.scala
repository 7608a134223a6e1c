package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed global prefix scan — row index and running sums under a total
  * order WITHOUT a single-partition window.
  *
  * `Window.orderBy(...)` with no `partitionBy` moves every row to ONE task
  * (Spark itself warns "this can cause serious performance degradation"):
  * correct on 60 k rows, dead at 100 TB. The classic parallel alternative is
  * the two-phase scan every MPP engine uses:
  *
  *   1. range-repartition on the sort keys and sort within partitions, so
  *      partition `p` holds a contiguous, ordered slice of the total order;
  *   2. one cheap pass computes per-partition `(rowCount, colSums…)` —
  *      `numPartitions` tiny tuples collected to the driver;
  *   3. an exclusive scan over those totals gives each partition its global
  *      offset, and a second pass emits `index = offset + localIndex` and
  *      `runSum = offsetSum + localRunSum`.
  *
  * Both passes share ONE shuffle: they are jobs over the same RDD object, so
  * the range-exchange map stage is computed once and skipped (shuffle files
  * reused) in the second job. Cost: one range shuffle + a `numPartitions`-row
  * driver collect — the 100 TB shape for Gini/KS/rank statistics.
  *
  * Contract:
  *   - `sortKeys` must be a TOTAL order (append a unique tiebreaker): equal
  *     keys may straddle a range boundary, which would make local ranks
  *     ambiguous otherwise.
  *   - `valueCols` must be `BIGINT` columns; running sums are exact Longs,
  *     so callers keep |Σ values| < 2⁶³ (cent-scaled values are safe to
  *     ~9·10¹¹ rows of 10⁷-cent items; beyond that, pre-scale).
  */
object DistributedPrefixSum {

  /** Append `idxName` (1-based global row index in `sortKeys` order) and one
    * `runPrefix+c` inclusive running sum per value column `c`.
    */
  def scan(
      df: DataFrame,
      sortKeys: Seq[String],
      valueCols: Seq[String],
      idxName: String = "global_idx",
      runPrefix: String = "run_"): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema
    valueCols.foreach { c =>
      require(schema(c).dataType == LongType,
        s"valueCol $c must be BIGINT for exact running sums, got ${schema(c).dataType}")
    }
    val outNames = idxName +: valueCols.map(runPrefix + _)
    outNames.foreach(n => require(!schema.fieldNames.contains(n),
      s"output column $n clashes with an input column"))

    val parts = spark.sparkContext.defaultParallelism
    val sorted = df
      .repartitionByRange(parts, sortKeys.map(col): _*)
      .sortWithinPartitions(sortKeys.map(col): _*)
    val vIdx = valueCols.map(schema.fieldIndex).toArray

    // ONE RDD object for both jobs → the range shuffle's map stage runs once
    // and is a skipped stage in the second job.
    val rdd = sorted.rdd

    // pass 1: per-partition (count, sums) — numPartitions tuples, tiny.
    val totals: Array[(Int, Long, Array[Long])] = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var c = 0L
        val s = Array.fill(vIdx.length)(0L)
        it.foreach { r =>
          c += 1
          var i = 0
          while (i < vIdx.length) { if (!r.isNullAt(vIdx(i))) s(i) += r.getLong(vIdx(i)); i += 1 }
        }
        Iterator.single((pid, c, s))
      }
      .collect()
      .sortBy(_._1)

    // exclusive scan over partition totals → per-partition offsets.
    val offIdx = new Array[Long](parts)
    val offSum = Array.fill(parts)(new Array[Long](vIdx.length))
    var accC = 0L
    val accS = Array.fill(vIdx.length)(0L)
    totals.foreach { case (pid, c, s) =>
      offIdx(pid) = accC
      offSum(pid) = accS.clone()
      accC += c
      var i = 0
      while (i < vIdx.length) { accS(i) += s(i); i += 1 }
    }

    // pass 2: emit global index + running sums (shuffle reused).
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var i = offIdx(pid)
      val run = offSum(pid).clone()
      it.map { r =>
        i += 1
        var k = 0
        while (k < vIdx.length) {
          if (!r.isNullAt(vIdx(k))) run(k) += r.getLong(vIdx(k)); k += 1
        }
        Row.fromSeq(r.toSeq ++ (i +: run.toSeq))
      }
    }
    val outSchema = StructType(
      schema.fields ++ outNames.map(StructField(_, LongType, nullable = false)))
    spark.createDataFrame(out, outSchema)
  }
}
