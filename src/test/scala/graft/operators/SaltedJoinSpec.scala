package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join equals plain join on skewed data; hot key spreads across partitions") {
    // 10k rows of one hot key + a uniform tail
    val left = spark.range(10000).select(lit(1L).as("k"), col("id").as("v"))
      .union(spark.range(1000).select((col("id") % 50 + 2).as("k"), col("id").as("v")))
    val right = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (10L, "c")).toDF("rk", "name")

    val plain = left.join(right, col("k") === col("rk"))
      .groupBy("name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SaltedJoin(left, col("k"), right, col("rk"), salts = 8)
      .groupBy("name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain, "salting must not change join results")
    assert(salted("hot") == 10000L)

    // the hot key's rows really do land in multiple shuffle partitions
    val shards = left.withColumn("__salt", (rand(42L) * 8).cast("int"))
      .filter(col("k") === 1L).select("__salt").distinct().count()
    assert(shards > 4, s"expected hot key spread over >4 of 8 shards, got $shards")
  }
}
