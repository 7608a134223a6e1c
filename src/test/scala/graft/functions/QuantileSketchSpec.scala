package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class QuantileSketchSpec extends SparkTestBase {

  private val median = Seq((50, 100))
  private val qs = Seq((25, 100), (50, 100), (75, 100), (90, 100))

  /** Exact lower quantile by the same integer rank rule the sketch uses. */
  private def exactLower(sorted: Seq[Double], num: Int, den: Int): Double = {
    val rank = (num.toLong * sorted.length + den - 1) / den
    sorted(math.max(1L, rank).toInt - 1)
  }

  test("exact mode: n <= k reproduces the sorted-list lower quantiles") {
    val agg = QuantileSketchAgg(64, qs)
    val data = Seq(9.0, 1.0, 5.0, 3.0, 7.0, 2.0, 8.0, 4.0, 6.0, 0.0)
    val b = data.foldLeft(agg.zero)(agg.reduce)
    val got = agg.finish(b)
    val sorted = data.sorted
    assert(got === qs.map { case (n, d) => exactLower(sorted, n, d) })
  }

  test("merge of disjoint exact buffers equals single-pass exact result") {
    val agg = QuantileSketchAgg(64, qs)
    val data = (1 to 50).map(_.toDouble)
    val (l, r) = data.splitAt(20)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(merged) === agg.finish(data.foldLeft(agg.zero)(agg.reduce)))
  }

  test("compaction keeps rank error bounded on 100k values") {
    val k = 128
    val agg = QuantileSketchAgg(k, qs)
    val n = 100000
    // deterministic permutation of 0..n-1 (7919 coprime with n) so insertion
    // order is scrambled and each value v has exactly v values below it
    val data = (0 until n).map(i => ((i.toLong * 7919) % n).toDouble)
    val b = data.foldLeft(agg.zero)(agg.reduce)
    val got = agg.finish(b)
    qs.zip(got).foreach { case ((num, den), est) =>
      val targetRank = num.toDouble / den * n
      // est is one of the data values in [0, n); its value IS its rank here
      val err = math.abs(est - targetRank) / n
      assert(err <= 0.05, s"quantile $num/$den: est=$est rank err $err > 5%")
    }
  }

  test("merge is associative enough: merged halves land within the same bound") {
    val k = 128
    val agg = QuantileSketchAgg(k, median)
    val n = 50000
    val data = (0 until n).map(i => ((i * 7919) % n).toDouble)
    val parts = data.grouped(5000).map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
    val merged = parts.reduce(agg.merge)
    val est = agg.finish(merged).head
    assert(math.abs(est - n / 2.0) / n <= 0.05)
  }

  test("buffer stays O(k log(n/k)): level count and per-level size bounded") {
    val k = 64
    val agg = QuantileSketchAgg(k, median)
    val b = (1 to 100000).map(_.toDouble).foldLeft(agg.zero)(agg.reduce)
    assert(b.levels.length <= 16, s"too many levels: ${b.levels.length}")
    assert(b.levels.forall(_.length <= k + 1),
      s"level over capacity: ${b.levels.map(_.length)}")
    assert(b.n === 100000L)
  }

  test("empty input yields NaN, single value is every quantile") {
    val agg = QuantileSketchAgg(8, qs)
    assert(agg.finish(agg.zero).forall(_.isNaN))
    val one = agg.reduce(agg.zero, 42.0)
    assert(agg.finish(one) === Seq(42.0, 42.0, 42.0, 42.0))
  }

  test("property: random streams, random partitionings — error stays bounded") {
    // seeded LCG over varied sizes/skews; merged-partition result must obey
    // the same rank-error bound as the single-pass sketch
    var seed = 0x9e3779b97f4a7c15L
    def nextLong(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
    for (trial <- 1 to 5) {
      val n = 5000 + (math.abs(nextLong()) % 45000).toInt
      val skew = 1 + (math.abs(nextLong()) % 3).toInt
      val data = (0 until n).map { _ =>
        val u = (math.abs(nextLong()) % 1000000) / 1000000.0
        math.pow(u, skew) * 1e6 // skew>1 piles mass near 0
      }
      val agg = QuantileSketchAgg(128, qs)
      val chunk = 1000 + (math.abs(nextLong()) % 9000).toInt
      val merged = data.grouped(chunk).map(_.foldLeft(agg.zero)(agg.reduce))
        .reduce(agg.merge)
      val sorted = data.sorted
      qs.zip(agg.finish(merged)).foreach { case ((num, den), est) =>
        // translate the value estimate back to a rank via binary search
        val rank = sorted.search(est).insertionPoint
        val target = num.toDouble / den * n
        assert(math.abs(rank - target) / n <= 0.06,
          s"trial $trial n=$n skew=$skew q=$num/$den: rank $rank vs $target")
      }
    }
  }

  test("build-then-merge (stored sketch lifecycle) equals the one-shot sketch") {
    val k = 128
    val oneShot = QuantileSketchAgg(k, qs)
    val build = QuantileSketchBuildAgg(k)
    val mergeA = QuantileSketchMergeAgg(k, qs)
    val n = 30000
    val data = (0 until n).map(i => ((i.toLong * 104729) % n).toDouble) // permutation
    // 30 "daily" sketches built independently, then merged — vs one pass.
    // Identical fold order ⇒ identical deterministic compactions ⇒ identical
    // levels, so the quantiles agree exactly.
    val daily = data.grouped(1000).map(_.foldLeft(build.zero)(build.reduce)).toSeq
    val merged = daily.foldLeft(mergeA.zero)(mergeA.reduce)
    val direct = data.grouped(1000).map(_.foldLeft(oneShot.zero)(oneShot.reduce))
      .reduce(oneShot.merge)
    assert(mergeA.finish(merged) === oneShot.finish(direct))
    assert(merged.n === n.toLong)
    // and the merged estimate still obeys the rank-error bound
    qs.zip(mergeA.finish(merged)).foreach { case ((num, den), est) =>
      val target = num.toDouble / den * n
      assert(math.abs(est - target) / n <= 0.05, s"q=$num/$den est=$est")
    }
  }

  test("works through Spark udaf partial+final aggregation") {
    val s = spark
    import s.implicits._
    val sketch = udaf(QuantileSketchAgg(256, median))
    val df = (1 to 1000).map(i => (i % 10, i.toDouble)).toDF("g", "v")
      .repartition(4)
    val got = df.groupBy("g").agg(sketch(col("v")).as("q"))
      .select(col("g"), col("q")(0).as("p50"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // group g holds {g+10k : k in 0..99} (100 values each); exact mode
    (0 to 9).foreach { g =>
      val vals = (1 to 1000).filter(_ % 10 == g).map(_.toDouble).sorted
      assert(got(g) === exactLower(vals, 50, 100), s"group $g")
    }
  }
}
