package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass column profiler: one summary row per column (null count,
  * distinct count, min/max as strings) computed in ONE aggregation over the
  * data — all per-column aggregates run side by side in the same partial+
  * final pass, then unpivot driver-side (the unpivot touches only the single
  * aggregated row, never the data). The data-quality sweep every ingest run
  * starts with; at 100 TB it costs exactly one scan.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { c =>
      row.select(
        lit(c).as("column"),
        (col(s"__n_$c") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }
    perCol.reduce(_.union(_))
  }
}
