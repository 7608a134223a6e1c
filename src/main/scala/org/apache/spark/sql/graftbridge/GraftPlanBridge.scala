package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{classic, DataFrame, SparkSession}

/** Minimal `private[sql]` bridge: turn a custom [[LogicalPlan]] into a
  * [[DataFrame]]. Lives under `org.apache.spark.sql` solely for access to
  * `classic.Dataset.ofRows` — the standard integration point every Spark
  * extension library uses to surface custom plan nodes through the public
  * Dataset API. Nothing else of Spark's internals leaks out of this object.
  */
object GraftPlanBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame (for composing custom
    * operators over arbitrary upstream frames).
    */
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Re-expose a batch frame as a STREAMING micro-batch frame: the plan is
    * lowered to its (lazy, distributed) InternalRow RDD and re-wrapped with
    * `isStreaming = true` — the contract a V1 streaming `Source.getBatch`
    * result must satisfy, and exactly how Spark's own file stream source
    * hands its per-batch scans to the engine. No row is materialized on
    * the driver; the RDD computes when the micro-batch executes.
    */
  def asStreaming(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** Wrap an [[org.apache.spark.sql.catalyst.InternalRow]] RDD as a batch
    * DataFrame WITHOUT the external-Row round trip: `createDataFrame(Row…)`
    * re-encodes every row through the RowEncoder (and `.rdd` first decoded
    * them) — for operators like the distributed prefix scan that only
    * append primitive columns, that codec round trip is the dominant
    * per-row cost. Rows must follow the InternalRow contract (caller copies
    * buffer-reusing rows before retaining values).
    */
  def internalCreateDataFrame(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)
}
