package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 60-bit SimHash fingerprints from md5-derived word hashes. Near-identical
  * texts land within a small hamming distance; grouping on the fingerprint
  * (or rotated prefixes of it) gives the scale path.
  *
  * Runs as one narrow `mapPartitions` pass — per-partition token-hash cache,
  * primitive bit loops, no shuffle, no per-token array allocation (the
  * 60-wide transform/zip_with expression formulation was ~10× slower).
  */
object SimHash {

  private val Bits = 60

  /** (id, simhash bigint, n_tokens bigint) per input row. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), lower(col(textCol)))
      .as[(Long, String)]
      .mapPartitions { it =>
        val hasher = new TokenHasher
        val bitsum = new Array[Int](Bits)
        it.flatMap { case (id, text) =>
          val ws = text.split(" ").filter(_.nonEmpty)
          if (ws.isEmpty) None
          else {
            java.util.Arrays.fill(bitsum, 0)
            var wi = 0
            while (wi < ws.length) {
              val h = hasher.h60(ws(wi))
              var b = 0
              while (b < Bits) {
                if (((h >> b) & 1L) == 1L) bitsum(b) += 1 else bitsum(b) -= 1
                b += 1
              }
              wi += 1
            }
            var fp = 0L
            var b = 0
            while (b < Bits) {
              if (bitsum(b) >= 0) fp |= (1L << b)
              b += 1
            }
            Some((id, fp, ws.length.toLong))
          }
        }
      }
      .toDF(idCol, "simhash", "n_tokens")
  }
}
