package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join: salt the skewed (probe) side's key with a
  * random shard in [0, salts), replicate the build side once per shard, and
  * join on (key, shard) — the classic salting rewrite that splits one hot
  * key's row group across `salts` reducers instead of one straggler task.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default here) covers sort-merge joins automatically at runtime; explicit
  * salting remains the tool when the skew is known up front, when the join is
  * not an SMJ, or when deterministic partition sizing matters. The salt uses
  * a seeded `rand` so plans stay reproducible.
  */
object SaltedJoin {

  /** Inner equi-join `left.key == right.key` with `salts`-way salting.
    * `right` is replicated `salts`× (keep it the smaller side).
    */
  def apply(left: DataFrame, leftKey: Column, right: DataFrame, rightKey: Column,
      salts: Int, seed: Long = 42L): DataFrame = {
    require(salts > 1, "salts must be > 1")
    val salted = left
      .withColumn("__salt", (rand(seed) * salts).cast("int"))
      .withColumn("__k", leftKey)
    val replicated = right
      .withColumn("__salt", explode(lit((0 until salts).toArray)))
      .withColumn("__k", rightKey)
    salted.join(replicated, Seq("__k", "__salt"))
      .drop("__k", "__salt")
  }
}
