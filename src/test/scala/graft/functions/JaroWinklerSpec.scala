package graft.functions

import graft.SparkTestBase
import graft.functions.expressions.JaroWinkler
import org.apache.spark.sql.functions.col

class JaroWinklerSpec extends SparkTestBase {
  import spark.implicits._

  // Expected values probed from DuckDB's jaro_winkler_similarity (the
  // oracle engine) — pins the boost-threshold (no Winkler boost at
  // jaro <= 0.7), prefix cap 4, and empty-string = 0.0 conventions.
  private val duckdbPinned = Seq(
    ("martha", "marhta", 0.9611111111111111),
    ("abcdefgh", "abzyxwvu", 0.5), // jaro 0.5 -> boost NOT applied
    ("ab", "xy", 0.0),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("a", "", 0.0),
    ("", "", 0.0),
    ("abc", "abc", 1.0),
    ("ab", "abcdefghij", 0.7866666666666667),
    ("crate", "trace", 0.7333333333333334), // zero common prefix
    ("dwayne", "duane", 0.8400000000000001))

  test("matches DuckDB-pinned values (interpreted path)") {
    duckdbPinned.foreach { case (a, b, want) =>
      val got = JaroWinkler.sim(a, b)
      assert(math.abs(got - want) < 1e-12, s"sim($a, $b) = $got, want $want")
    }
  }

  test("codegen path agrees with interpreted path and resolves via SQL") {
    JaroWinkler.register(spark)
    val df = duckdbPinned.map { case (a, b, w) => (a, b, w) }
      .toDF("a", "b", "want")
    val rows = df
      .selectExpr("jaro_winkler(a, b) AS got", "want")
      .as[(Double, Double)].collect()
    rows.foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-12, s"codegen got=$got want=$want")
    }
    // Column-API form
    val viaCol = df.select(
      expressions.JaroWinkler.jaroWinkler(col("a"), col("b")).as("s"))
      .as[Double].collect()
    assert(viaCol.length == duckdbPinned.size)
  }

  test("symmetric and bounded in [0, 1] on random strings") {
    val rng = new scala.util.Random(3)
    (1 to 200).foreach { _ =>
      val a = rng.alphanumeric.take(rng.nextInt(12)).mkString
      val b = rng.alphanumeric.take(rng.nextInt(12)).mkString
      val ab = JaroWinkler.sim(a, b)
      val ba = JaroWinkler.sim(b, a)
      assert(ab == ba, s"asymmetric on ($a, $b)")
      assert(ab >= 0.0 && ab <= 1.0)
    }
  }
}
