package graft.functions

import graft.SparkTestBase
import graft.functions.expressions.InterleaveBits
import org.apache.spark.sql.functions._

class InterleaveBitsSpec extends SparkTestBase {
  import spark.implicits._

  /** Naive bit-by-bit reference. */
  private def naive(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("interleave_bits matches the naive bit loop and round-trips axes") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (0xffffL, 0L), (0L, 0xffffL),
      (0xffffL, 0xffffL), (0x1234L, 0xabcdL), (4095L, 4095L), (70000L, 3L))
    cases.foreach { case (x, y) =>
      assert(InterleaveBits.morton16(x, y) == naive(x, y), s"($x, $y)")
    }
    // x occupies even bits only, y odd bits only
    assert((InterleaveBits.morton16(0xffffL, 0L) & 0xaaaaaaaaL) == 0L)
    assert((InterleaveBits.morton16(0L, 0xffffL) & 0x55555555L) == 0L)
    // adjacent cells differ in low bits: locality of the curve
    assert(InterleaveBits.morton16(2L, 3L) == naive(2L, 3L))
  }

  test("interleave_bits evaluates via Column API, SQL registry, and codegen") {
    val df = Seq((3L, 5L), (4095L, 0L), (0L, 4095L)).toDF("x", "y")
    val viaCol = df.select(InterleaveBits.interleaveBits(col("x"), col("y")))
      .collect().map(_.getLong(0)).toSeq
    assert(viaCol == Seq(naive(3, 5), naive(4095, 0), naive(0, 4095)))

    InterleaveBits.register(spark)
    val viaSql = df.select(expr("interleave_bits(x, y)")).collect().map(_.getLong(0)).toSeq
    assert(viaSql == viaCol)

    val big = spark.range(1000)
      .select(col("id").as("x"), (col("id") * 7 % 4096).as("y"))
      .select(expr("interleave_bits(x, y)").as("z"))
    val plan = big.queryExecution.executedPlan.toString()
    assert(plan.contains("*(1) Project [interleave_bits"),
      s"expression must sit inside a codegen stage (the *(n) marker): $plan")
    val zs = big.collect().map(_.getLong(0))
    assert(zs.toSet.size == 1000, "distinct inputs give distinct Morton codes")
  }

  test("z-bucket prefix forms aligned tiles (the layout-pruning property)") {
    // bucket = z >> 20 over 12-bit keys: each bucket must span exactly one
    // 1024x1024-aligned tile of the (x, y) plane
    val xs = (0 until 4096 by 97).map(_.toLong)
    val tiles = for (x <- xs; y <- xs) yield {
      val b = InterleaveBits.morton16(x, y) >> 20
      (b, x >> 10, y >> 10)
    }
    tiles.groupBy(_._1).foreach { case (b, g) =>
      assert(g.map(t => (t._2, t._3)).distinct.size == 1,
        s"bucket $b mixes tiles: ${g.map(t => (t._2, t._3)).distinct}")
    }
  }
}
