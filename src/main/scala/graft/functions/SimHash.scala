package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 60-bit SimHash fingerprints from md5-derived word hashes — built entirely
  * from codegen'd array built-ins (one narrow projection per row, no
  * shuffle, no UDF). Near-identical texts land within a small hamming
  * distance; grouping on the fingerprint (or rotated prefixes of it) gives
  * the scale path.
  */
object SimHash {

  private val Bits = 60

  /** (id, simhash bigint, n_tokens bigint) per input row. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    df.select(col(idCol), split(lower(col(textCol)), " ").as("ws0"))
      .withColumn("ws", expr("filter(ws0, w -> w <> '')"))
      .filter(size(col("ws")) > 0)
      .withColumn("hs", expr(
        "transform(ws, w -> CAST(conv(substring(md5(w), 1, 15), 16, 10) AS BIGINT))"))
      .withColumn("bitsum", expr(
        s"""aggregate(hs, transform(sequence(0, ${Bits - 1}), i -> CAST(0 AS BIGINT)),
           |  (acc, h) -> zip_with(acc,
           |       transform(sequence(0, ${Bits - 1}),
           |                 i -> CASE WHEN shiftright(h, i) % 2 = 1 THEN 1 ELSE -1 END),
           |       (a, b) -> a + CAST(b AS BIGINT)))""".stripMargin))
      .withColumn("simhash", expr(
        s"""aggregate(transform(sequence(0, ${Bits - 1}),
           |  i -> CASE WHEN element_at(bitsum, i + 1) >= 0
           |            THEN shiftleft(CAST(1 AS BIGINT), i)
           |            ELSE CAST(0 AS BIGINT) END),
           |  CAST(0 AS BIGINT), (a, x) -> a + x)""".stripMargin))
      .select(col(idCol), col("simhash"), size(col("ws")).cast("long").as("n_tokens"))
  }
}
