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
}
