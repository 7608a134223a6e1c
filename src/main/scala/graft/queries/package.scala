package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{instr, lit}

package object queries {

  /** Numeric value of one lowercase hex digit via `instr` arithmetic — the
    * portable subset both Spark and DuckDB evaluate identically, used
    * wherever an md5 prefix becomes a deterministic bucket or uniform draw
    * (q73 split assignment, q92 importance resampling).
    */
  private[queries] def hexDigitVal(c: Column): Column =
    instr(lit("0123456789abcdef"), c) - 1
}
