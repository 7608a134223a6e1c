package graft.functions

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkTestBase {

  test("int8 roundtrip error is bounded by scale/2 per element; cosine survives") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = Quantize.dequantize(Quantize.int8(emb, "embedding"))
      .withColumn("orig", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("max_err", expr(
        "aggregate(zip_with(orig, deq, (a, b) -> abs(a - b)), CAST(0.0 AS DOUBLE), (m, e) -> greatest(m, e))"))
      .withColumn("cos", expr(
        """aggregate(zip_with(orig, deq, (a, b) -> a * b), CAST(0.0 AS DOUBLE), (s, x) -> s + x)
          | / (sqrt(aggregate(orig, CAST(0.0 AS DOUBLE), (s, x) -> s + x * x))
          |    * sqrt(aggregate(deq, CAST(0.0 AS DOUBLE), (s, x) -> s + x * x)))""".stripMargin))
      .select("q_scale", "max_err", "cos")
      .collect()
    q.foreach { r =>
      val (scale, err, cos) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(err <= scale / 2 + 1e-9, s"per-element error $err exceeds scale/2 = ${scale / 2}")
      assert(cos >= 0.995, s"cosine to original degraded to $cos")
    }
    // tinyint storage really is 1 byte wide in the schema
    val schema = Quantize.int8(emb, "embedding").schema("q").dataType.sql
    assert(schema == "ARRAY<TINYINT>", schema)
  }

  test("all-zero vectors quantize to zeros instead of NaN") {
    import spark.implicits._
    val df = Seq((1L, Seq(0.0f, 0.0f, 0.0f)), (2L, Seq(1.0f, -2.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val q = Quantize.int8(df, "embedding").orderBy("vec_id").collect()
    assert(q(0).getSeq[Byte](q(0).fieldIndex("q")).toList == List[Byte](0, 0, 0))
    assert(q(0).getDouble(q(0).fieldIndex("q_scale")) == 0.0)
    assert(q(1).getSeq[Byte](q(1).fieldIndex("q")).max > 0)
  }
}
