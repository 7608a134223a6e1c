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

  /** Near-dup pairs with hamming distance ≤ maxDist, sub-quadratically: by
    * the pigeonhole principle, two 60-bit fingerprints within distance d
    * agree exactly on at least one of d+1 disjoint bit-bands, so candidates
    * are found by joining on (band_index, band_value) — one shuffle on the
    * band key instead of an all-pairs product — then filtered with the
    * codegen'd [[graft.functions.expressions.HammingDistance]].
    */
  def neardupPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int): DataFrame = {
    import graft.functions.expressions.HammingDistance.hamming64
    val bands = maxDist + 1
    val width = Bits / bands // last band absorbs the remainder bits
    val lastWidth = Bits - (bands - 1) * width
    val mask = (1L << width) - 1
    val lastMask = (1L << lastWidth) - 1
    val fps = fingerprints(df, idCol, textCol).select(col(idCol), col("simhash"))
    val bandExprs = (0 until bands).map { j =>
      val m = if (j == bands - 1) lastMask else mask
      s"shiftright(simhash, ${j * width}) & ${m}L"
    }
    val banded = fps.select(col(idCol), col("simhash"),
      posexplode(expr(s"array(${bandExprs.mkString(",")})")).as(Seq("band", "key")))
    val l = banded.select(col(idCol).as("d1"), col("simhash").as("h1"), col("band"), col("key"))
    val r = banded.select(col(idCol).as("d2"), col("simhash").as("h2"), col("band"), col("key"))
    l.join(r, Seq("band", "key"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"), hamming64(col("h1"), col("h2")).as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }

  /** (id, simhash bigint, n_tokens bigint) per input row. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // spread small scans to full parallelism before the hashing pass
    // (no-op at scale, see Tables.spread)
    graft.Tables.spread(
      df.select(col(idCol).cast("long").as(idCol), lower(col(textCol))), idCol)
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
