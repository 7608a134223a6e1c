package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: a Spark plan builder plus (where the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB oracle statement run by the
  * driver on the same parquet tables.
  *
  * Determinism contract (SURVEY.md §2.2 notes): every oracle-checked query
  * ends in a total-order `ORDER BY`; money aggregates go through
  * DECIMAL(18,2/4) so both engines produce bit-identical doubles; integer
  * outputs are BIGINT on both sides; timestamps are emitted as epoch-micros
  * BIGINT or formatted strings, never raw timestamp values.
  */
final case class GraftQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryPack {
  def queries: Seq[GraftQuery]
}
