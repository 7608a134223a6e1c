package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the shared parquet test tables (see TESTDATA.md / FIXTURES.md §B). */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.parquet` stores INT64 TIMESTAMP(NANOS) which Spark's parquet
    * reader rejects unless nanos are surfaced as raw longs; with the legacy
    * flag the `ts` column reads as BIGINT nanoseconds since epoch.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view (for spark.sql-path queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))

  /** Hash-spread `df` to full parallelism when its scan planned fewer
    * partitions (a small table = one row group = one task, which would
    * single-thread any explode/flatMap fan-out downstream). At scale the
    * scan already has ≥ parallelism partitions and this is a no-op.
    */
  def spread(df: DataFrame, keyCol: String): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    // probe the planned partition count on the EXISTING QueryExecution —
    // df.rdd would append a DeserializeToObject and build (and plan) a whole
    // second QueryExecution just to read a number
    if (df.queryExecution.toRdd.getNumPartitions < par)
      df.repartition(par, org.apache.spark.sql.functions.col(keyCol))
    else df
  }
}
