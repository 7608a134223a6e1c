package graft

class GraftSessionSpec extends SparkTestBase {

  test("GraftSession wires extensions: hamming64 resolves in SQL; views register") {
    // the shared test session already exists; builder configs still apply to
    // a derived session in the same JVM
    val s = GraftSession.create(master = "local[4]", shufflePartitions = 4,
      tablesDir = Some("/root/testdata/sf0.001"))
    try {
      val d = s.sql("SELECT hamming64(CAST(7 AS BIGINT), CAST(0 AS BIGINT)) AS d")
        .collect()(0).getLong(0)
      assert(d == 3L)
      assert(s.sql("SELECT COUNT(*) FROM lineitem").collect()(0).getLong(0) > 0)
      assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
    } finally () // shared JVM session; do not stop
  }
}
