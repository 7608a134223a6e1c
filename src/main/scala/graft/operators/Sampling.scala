package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{conv, lit, md5, substring}

/** Sampling primitives with the reference CLI's input validation
  * (`cli/Sample.java:125-127`): a fraction outside (0, 1] is refused up
  * front instead of silently sampling nothing or everything.
  */
object Sampling {

  /** Seeded RNG Bernoulli (Spark's native sampler) — kept for reference
    * parity; deterministic for a fixed seed AND fixed partitioning, but the
    * draw is engine- and layout-dependent. Prefer [[bernoulliByHash]] when
    * the selection must be reproducible across engines or corpus regrowth.
    */
  def bernoulli(df: DataFrame, fraction: Double, seed: Long): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"sample fraction must be in (0, 1], got $fraction")
    df.sample(withReplacement = false, fraction = fraction, seed = seed)
  }

  /** 12-bit content-addressed bucket (0..4095) from the md5 of `key`:
    * the first 3 hex digits parsed as one base-16 number — numerically
    * identical to the per-digit instr arithmetic the DuckDB oracles
    * replay (the q73 split-assignment trick), but ONE md5 evaluation
    * instead of three (filter codegen does not eliminate the common
    * subexpression; at 100 TB the digest dominates the draw). md5 is
    * uniform per digit, so `bucket < round(p·4096)` is a Bernoulli(p)
    * draw that is a pure function of the key.
    */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 3), 16, 10).cast("int")

  /** Deterministic content-addressed Bernoulli: keep a row iff its
    * [[hashBucket]] falls under `round(fraction·4096)`. Same inclusion
    * probability as the RNG sampler but reproducible across engines, runs,
    * cluster sizes, AND corpus regrowth — a row's fate is a pure function
    * of its key, so re-sampling a regrown corpus never migrates rows (the
    * property training-data splits rely on), and the selection is
    * replayable in ANSI SQL for oracle checking.
    */
  def bernoulliByHash(df: DataFrame, fraction: Double, key: Column): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"sample fraction must be in (0, 1], got $fraction")
    df.filter(hashBucket(key) < lit(math.round(fraction * 4096.0).toInt))
  }
}
