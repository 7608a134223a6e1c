package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Symmetric int8 scalar quantization for embedding columns: per-vector
  * scale = max|x|/127, stored as (array<byte>, scale float). 4× smaller than
  * float32 on disk and over the wire — the standard first rung of the
  * memory/recall ladder for 100 TB ANN (before PQ/OPQ). Quantize and
  * dequantize are one narrow codegen'd projection each (higher-order array
  * functions, no UDF, no shuffle).
  */
object Quantize {

  /** Adds `q` (array<tinyint>) and `q_scale` (double); drops nothing.
    * An all-zero vector gets q_scale = 0 and quantizes to zeros (guarded —
    * 0/0 would otherwise produce NaN and fail the TINYINT cast under ANSI).
    */
  def int8(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("q_scale",
        expr(s"aggregate($vecCol, CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, abs(CAST(x AS DOUBLE)))) / 127.0"))
      .withColumn("q", expr(
        s"""transform($vecCol, x -> CAST(CASE WHEN q_scale = 0.0 THEN 0.0
           |  ELSE round(CAST(x AS DOUBLE) / q_scale) END AS TINYINT))""".stripMargin))

  /** Reconstructs an array<double> from (q, q_scale). */
  def dequantize(df: DataFrame, out: String = "deq"): DataFrame =
    df.withColumn(out, expr("transform(q, b -> CAST(b AS DOUBLE) * q_scale)"))
}
