package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Per-key ordered sequential fold — the engine primitive for recurrences a
  * window function cannot express (EMA, compound interest, any
  * `state_t = f(state_{t-1}, x_t)`).
  *
  * The scalable layout is the classic secondary-sort idiom: ONE shuffle
  * (`repartition(key)`) + partition-local `sortWithinPartitions(key, order…)`
  * + a single forward pass holding O(1) state per key — a billion-event user
  * history folds in constant memory, where the window/`collect_list`
  * composition (the only pure-SQL alternative, used by the DuckDB oracle and
  * the cross-check spec) materializes each key's full sequence.
  *
  * The caller's order columns must total-order rows within a key (include a
  * unique tie-breaker) — then the fold visits rows in exactly one order and
  * the float recurrence is bit-deterministic under any partitioning. Key and
  * value columns must be non-null (LongType key, numeric value).
  */
object SequentialFold {

  /** Shared secondary-sort layout + input-type contract: the fold reads the
    * key as Long and the value as Double positionally, so anything else
    * (IntegerType key, DecimalType value) would die mid-job with an
    * executor ClassCastException — reject the key loudly up front and cast
    * the value explicitly instead.
    */
  private def sortedForFold(df: DataFrame, key: String, order: Seq[String],
      value: String): DataFrame = {
    require(df.schema(key).dataType == LongType,
      s"fold key $key must be BIGINT, got ${df.schema(key).dataType}")
    require(df.schema(value).dataType.isInstanceOf[
        org.apache.spark.sql.types.NumericType],
      s"fold value $value must be numeric, got ${df.schema(value).dataType}")
    df.select((key +: order :+ value).map(col): _*)
      .withColumn(value, col(value).cast(DoubleType)) // replaces in place
      .repartition(col(key))
      .sortWithinPartitions((key +: order).map(col): _*)
  }

  /** Exponential moving average per key: `ema = alpha·x + (1−alpha)·ema`,
    * seeded with the key's first value in `(order…)` position. Returns one
    * row per key: (key, n_rows, ema).
    */
  def ema(df: DataFrame, key: String, order: Seq[String], value: String,
      alpha: Double): DataFrame = {
    val sorted = sortedForFold(df, key, order, value)
    val schema = sorted.schema
    val keyIdx = schema.fieldIndex(key)
    val valIdx = schema.fieldIndex(value)
    val outSchema = StructType(Seq(
      StructField(key, LongType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("ema", DoubleType, nullable = false)))
    val folded = sorted.mapPartitions { rows =>
      val it = rows.buffered
      new Iterator[Row] {
        override def hasNext: Boolean = it.hasNext
        override def next(): Row = {
          val first = it.next()
          val k = first.getLong(keyIdx)
          var n = 1L
          var acc = first.getDouble(valIdx)
          while (it.hasNext && it.head.getLong(keyIdx) == k) {
            val cur = it.next()
            n += 1
            acc = alpha * cur.getDouble(valIdx) + (1.0 - alpha) * acc
          }
          Row(k, n, acc)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
    folded.toDF()
  }

  /** Holt's linear-trend (double exponential) smoothing per key — a
    * TWO-state recurrence no window function expresses:
    * `l_t = α·x_t + (1−α)(l_{t−1}+b_{t−1})`,
    * `b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}`, seeded `l₁ = x₁, b₁ = 0`.
    * Same secondary-sort layout as [[ema]]: one shuffle, O(1) state per
    * key, bit-deterministic because the fold visits each key's rows in
    * exactly the caller's total order. Returns one row per key:
    * (key, n_rows, level, trend, forecast₁ = level + trend).
    */
  def holt(df: DataFrame, key: String, order: Seq[String], value: String,
      alpha: Double, beta: Double): DataFrame = {
    val sorted = sortedForFold(df, key, order, value)
    val schema = sorted.schema
    val keyIdx = schema.fieldIndex(key)
    val valIdx = schema.fieldIndex(value)
    val outSchema = StructType(Seq(
      StructField(key, LongType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("level", DoubleType, nullable = false),
      StructField("trend", DoubleType, nullable = false),
      StructField("forecast", DoubleType, nullable = false)))
    val folded = sorted.mapPartitions { rows =>
      val it = rows.buffered
      new Iterator[Row] {
        override def hasNext: Boolean = it.hasNext
        override def next(): Row = {
          val first = it.next()
          val k = first.getLong(keyIdx)
          var n = 1L
          var l = first.getDouble(valIdx)
          var b = 0.0
          while (it.hasNext && it.head.getLong(keyIdx) == k) {
            val x = it.next().getDouble(valIdx)
            n += 1
            val lNext = alpha * x + (1.0 - alpha) * (l + b)
            b = beta * (lNext - l) + (1.0 - beta) * b
            l = lNext
          }
          Row(k, n, l, b, l + b)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
    folded.toDF()
  }
}
