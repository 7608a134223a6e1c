package graft.operators

import org.apache.spark.sql.DataFrame

/** Bernoulli sampling with the reference CLI's input validation
  * (`cli/Sample.java:125-127`): a fraction outside (0, 1] is refused up
  * front instead of silently sampling nothing or everything.
  */
object Sampling {

  def bernoulli(df: DataFrame, fraction: Double, seed: Long): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"sample fraction must be in (0, 1], got $fraction")
    df.sample(withReplacement = false, fraction = fraction, seed = seed)
  }
}
