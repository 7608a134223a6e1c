package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{instr, lit}

package object queries {

  /** Numeric value of one lowercase hex digit via `instr` arithmetic — the
    * portable subset both Spark and DuckDB evaluate identically, used
    * wherever an md5 prefix becomes a deterministic bucket or uniform draw
    * (q73 split assignment, q92 importance resampling).
    */
  private[queries] def hexDigitVal(c: Column): Column =
    instr(lit("0123456789abcdef"), c) - 1

  /** Force execution of a query whose result has a HARD small row bound
    * (a `limit`, or a groupBy over a k-bounded key) and return it as a
    * local relation. Used where a builder must consume cached/temporary
    * inputs before returning (the inputs are released or deleted right
    * after this call) — unlike `persist()+count()`, no cache entry and no
    * lineage over the temporaries outlive the builder. NOT for unbounded
    * results: the rows transit the driver.
    */
  private[queries] def materializeSmall(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription("graft:materialize result")
    val rows =
      try java.util.Arrays.asList(df.collect(): _*)
      finally sc.setJobDescription(prev)
    df.sparkSession.createDataFrame(rows, df.schema)
  }
}
