package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Single-pass column profiler: one summary row per column (null count,
  * distinct count, min/max as strings) computed in ONE aggregation over the
  * data — all per-column aggregates run side by side in the same partial+
  * final pass, then the single aggregated row is unpivoted driver-side into
  * a local relation (the data is never scanned again). The data-quality
  * sweep every ingest run starts with; at 100 TB it costs exactly one scan
  * (Spark plans the multi-column exact distincts via one Expand over that
  * scan — #distinct-columns projections of each row, still a single pass).
  */
object Profiler {

  private val outSchema = StructType(Seq(
    StructField("column", StringType, nullable = false),
    StructField("n_nulls", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("min_value", StringType, nullable = true),
    StructField("max_value", StringType, nullable = true)))

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val out = cols.zipWithIndex.map { case (c, i) =>
      val base = i * 5
      Row(c,
        row.getLong(base) - row.getLong(base + 1),
        row.getLong(base + 2),
        if (row.isNullAt(base + 3)) null else row.getString(base + 3),
        if (row.isNullAt(base + 4)) null else row.getString(base + 4))
    }
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(out: _*), outSchema)
  }
}
