package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash + LSH banding for near-duplicate detection at scale.
  *
  * Everything is built from codegen'd Catalyst built-ins (md5, conv,
  * higher-order array functions) — no Scala UDFs in the hot path. The base
  * shingle hash is the first 15 hex digits of md5 (a 60-bit integer both
  * engines can reproduce), folded into 31 bits; the k signature slots apply
  * affine permutations `(2i+1)·h + 1000003·i (mod 2^31-1)`.
  *
  * Scale shape: signatures are one narrow projection; banding turns the
  * quadratic all-pairs problem into a shuffle on (band, key) where only
  * same-bucket docs meet — the standard sub-quadratic MinHash-LSH layout.
  */
object MinHash {

  private val M = 2147483647L // 2^31 - 1

  /** Per-row MinHash signature: (id, sig array<bigint>[numHashes]).
    *
    * Slot i applies an independent affine permutation `(a_i·h + b_i) mod M`
    * with a_i, b_i drawn from a fixed-seed RNG — large random multipliers,
    * not small constants, so the k minima decorrelate and the matching-slot
    * fraction is an unbiased Jaccard estimate. a_i,h < M = 2^31−1 keeps the
    * product below 2^63 (no overflow).
    */
  def signatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, shingleSize: Int): DataFrame = {
    val rng = new java.util.Random(987654321L)
    val slots = Array.fill(numHashes) {
      val a = 1L + rng.nextInt((M - 1).toInt)
      val b = rng.nextInt(M.toInt).toLong
      s"array_min(transform(hs, h -> (${a}L * h + ${b}L) % ${M}L))"
    }
    df.select(col(idCol), split(col(textCol), " ").as("ws"))
      .filter(size(col("ws")) >= shingleSize)
      .withColumn("shingles", array_distinct(expr(
        s"transform(sequence(0, size(ws) - $shingleSize), i -> concat_ws(' ', slice(ws, i + 1, $shingleSize)))")))
      .withColumn("hs", expr(
        s"transform(shingles, s -> CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT) % $M)"))
      .withColumn("sig", expr(s"array(${slots.mkString(",")})"))
      .select(col(idCol), col("sig"))
  }

  /** LSH candidate pairs with estimated similarity (fraction of matching
    * signature slots), thresholded at `minEstSim`.
    */
  def candidatePairs(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, bands: Int, shingleSize: Int,
      minEstSim: Double = 0.25): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sigs = signatures(df, idCol, textCol, numHashes, shingleSize)

    val banded = sigs
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), j -> concat_ws(',', transform(slice(sig, j * $rows + 1, $rows), x -> CAST(x AS STRING))))")))
      .toDF(idCol, "band", "key")

    val l = banded.select(col(idCol).as("d1"), col("band"), col("key"))
    val r = banded.select(col(idCol).as("d2"), col("band"), col("key"))
    val cand = l.join(r, Seq("band", "key"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"))
      .distinct()

    cand
      .join(sigs.select(col(idCol).as("d1"), col("sig").as("sig1")), Seq("d1"))
      .join(sigs.select(col(idCol).as("d2"), col("sig").as("sig2")), Seq("d2"))
      .withColumn("est_sim", expr(
        "size(filter(zip_with(sig1, sig2, (x, y) -> x = y), b -> b)) / CAST(size(sig1) AS DOUBLE)"))
      .filter(col("est_sim") >= minEstSim)
      .select(col("d1"), col("d2"), round(col("est_sim"), 4).as("est_sim"))
  }
}
