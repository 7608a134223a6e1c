package graft.plans

import graft.{GraftSession, SparkTestBase}

class RewriteSingletonRepartitionSpec extends SparkTestBase {

  test("repartition(1) rewrites to coalesce(1) only when the flag is on") {
    val s = GraftSession.create(master = "local[4]", shufflePartitions = 4)
    try {
      s.conf.set("spark.graft.rewriteSingletonRepartition", "true")
      val rewritten = s.range(100).toDF("id").repartition(1)
      assert(!rewritten.queryExecution.executedPlan.toString().contains("Exchange"),
        "flag on: the shuffle must disappear")
      assert(rewritten.rdd.getNumPartitions == 1)
      assert(rewritten.count() == 100)

      s.conf.set("spark.graft.rewriteSingletonRepartition", "false")
      val kept = s.range(100).toDF("id").repartition(1)
      assert(kept.queryExecution.executedPlan.toString().contains("Exchange"),
        "flag off (default): repartition(1) stays a shuffle")
    } finally s.conf.unset("spark.graft.rewriteSingletonRepartition")
  }
}
