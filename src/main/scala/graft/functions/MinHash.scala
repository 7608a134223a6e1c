package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash + LSH banding for near-duplicate detection at scale.
  *
  * The base shingle hash is the first 60 bits of md5 folded mod M = 2^31−1
  * (engine-portable, see [[TokenHasher]]); slot i of the signature applies an
  * independent affine permutation `(a_i·h + b_i) mod M` with coefficients
  * from a fixed-seed RNG, so the fraction of matching slots is an unbiased
  * Jaccard estimate. a_i, h < M keeps products below 2^63.
  *
  * Scale shape: signatures are one narrow `mapPartitions` projection
  * (per-partition shingle-hash cache, primitive min loops); banding turns
  * the quadratic all-pairs problem into a shuffle on (band, key) where only
  * same-bucket docs meet — the standard sub-quadratic MinHash-LSH layout.
  */
object MinHash {

  private val M = 2147483647L // 2^31 - 1

  // private[graft]: the DuckDB oracle for q40 embeds these as literals so
  // the replayed signature pipeline stays in sync with this definition
  private[graft] def coefficients(numHashes: Int): Array[(Long, Long)] = {
    val rng = new java.util.Random(987654321L)
    Array.fill(numHashes) {
      (1L + rng.nextInt((M - 1).toInt), rng.nextInt(M.toInt).toLong)
    }
  }

  /** Per-row MinHash signature: (id, sig array<bigint>[numHashes]). */
  def signatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, shingleSize: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val coeffs = coefficients(numHashes)
    // small scans plan one partition — spread so hashing runs at full
    // parallelism (no-op at scale, see Tables.spread)
    graft.Tables.spread(df.select(col(idCol).cast("long").as(idCol), col(textCol)), idCol)
      .as[(Long, String)]
      .mapPartitions { it =>
        val hasher = new TokenHasher
        it.flatMap { case (id, text) =>
          val ws = text.split(" ")
          if (ws.length < shingleSize) None
          else {
            val sig = Array.fill(numHashes)(Long.MaxValue)
            val sb = new java.lang.StringBuilder(64)
            var i = 0
            while (i <= ws.length - shingleSize) {
              sb.setLength(0)
              var j = 0
              while (j < shingleSize) {
                if (j > 0) sb.append(' ')
                sb.append(ws(i + j))
                j += 1
              }
              val h = hasher.h60(sb.toString) % M
              var k = 0
              while (k < numHashes) {
                val v = (coeffs(k)._1 * h + coeffs(k)._2) % M
                if (v < sig(k)) sig(k) = v
                k += 1
              }
              i += 1
            }
            Some((id, sig))
          }
        }
      }
      .toDF(idCol, "sig")
  }

  /** LSH candidate pairs with estimated similarity (fraction of matching
    * signature slots), thresholded at `minEstSim`.
    */
  def candidatePairs(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, bands: Int, shingleSize: Int,
      minEstSim: Double = 0.25): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    // signatures feed the banding explode AND both verify joins — persist so
    // the per-partition hashing pass runs once, not 3×, per invocation (the
    // same persist/materialize/unpersist discipline as PrefixFilterJoin)
    val sigs = signatures(df, idCol, textCol, numHashes, shingleSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

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

    val out = cand
      .join(sigs.select(col(idCol).as("d1"), col("sig").as("sig1")), Seq("d1"))
      .join(sigs.select(col(idCol).as("d2"), col("sig").as("sig2")), Seq("d2"))
      .withColumn("est_sim", expr(
        "size(filter(zip_with(sig1, sig2, (x, y) -> x = y), b -> b)) / CAST(size(sig1) AS DOUBLE)"))
      .filter(col("est_sim") >= minEstSim)
      .select(col("d1"), col("d2"), round(col("est_sim"), 4).as("est_sim"))
    // materialize the (candidate pairs ≪ corpus) result eagerly, then drop
    // the signature cache — a lazy return would pin it for the session
    val result = out.localCheckpoint()
    sigs.unpersist()
    result
  }
}
