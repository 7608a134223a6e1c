package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Sink surface (SURVEY.md §2.1 K1): text sink with refuse-to-overwrite
  * parity (`cli/Sample.java:75-78`), parquet roundtrip fidelity.
  */
class SinkSpec extends SparkTestBase {
  import spark.implicits._

  test("text sink writes sample lines; ErrorIfExists refuses to overwrite") {
    val out = Files.createTempDirectory("sink-text").toFile.getAbsolutePath + "/out"
    val df = Seq("line-a", "line-b").toDF("value")
    df.coalesce(1).write.mode(SaveMode.ErrorIfExists).text(out)
    val back = spark.read.text(out).collect().map(_.getString(0)).sorted
    assert(back.toSeq == Seq("line-a", "line-b"))
    intercept[Exception] {
      df.write.mode(SaveMode.ErrorIfExists).text(out)
    }
  }

  test("parquet roundtrip preserves schema and values incl. arrays") {
    val out = Files.createTempDirectory("sink-parquet").toFile.getAbsolutePath + "/t"
    val df = Seq((1L, "x", Seq(1.0f, 2.0f)), (2L, "y", Seq(3.0f)))
      .toDF("id", "s", "vec")
    df.write.parquet(out)
    val back = spark.read.parquet(out)
    // parquet normalizes nullability; names+types must survive exactly
    assert(back.schema.fields.map(f => (f.name, f.dataType.sql)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType.sql)).toSeq)
    assert(back.orderBy("id").collect().map(_.toString).toSeq ==
      df.orderBy("id").collect().map(_.toString).toSeq)
  }

  test("zstd-compressed parquet roundtrips (the recommended codec over gzip)") {
    val out = Files.createTempDirectory("sink-zstd").toFile.getAbsolutePath + "/t"
    val df = Tables(spark, "/root/testdata/sf0.001", "nation")
    df.write.option("compression", "zstd").parquet(out)
    assert(new java.io.File(out).listFiles().exists(_.getName.endsWith(".zstd.parquet")))
    assert(spark.read.parquet(out).count() == df.count())
  }

  test("observe: pipeline metrics ride the job without a second pass") {
    import org.apache.spark.sql.Observation
    val obs = Observation("rowstats")
    val df = Tables(spark, "/root/testdata/sf0.001", "orders")
      .observe(obs, count(lit(1)).as("n"), sum(col("o_totalprice")).as("total"))
    val n = df.count()
    assert(obs.get("n").asInstanceOf[Long] == n)
    assert(obs.get("total").asInstanceOf[Double] > 0)
  }

  test("csv and json roundtrip with schema (interchange formats)") {
    val base = Files.createTempDirectory("sink-fmt").toFile.getAbsolutePath
    val df = Tables(spark, "/root/testdata/sf0.001", "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
    df.write.option("header", "true").csv(s"$base/csv")
    df.write.json(s"$base/json")
    val csvBack = spark.read.option("header", "true").schema(df.schema).csv(s"$base/csv")
    val jsonBack = spark.read.schema(df.schema).json(s"$base/json")
    val want = df.orderBy("n_nationkey").collect().map(_.toString).toSeq
    assert(csvBack.orderBy("n_nationkey").collect().map(_.toString).toSeq == want)
    assert(jsonBack.orderBy("n_nationkey").collect().map(_.toString).toSeq == want)
  }

  test("partitioned parquet write prunes partitions on read") {
    val out = Files.createTempDirectory("sink-part").toFile.getAbsolutePath + "/t"
    Tables(spark, "/root/testdata/sf0.001", "orders")
      .withColumn("yr", year(col("o_orderdate")))
      .write.partitionBy("yr").parquet(out)
    val one = spark.read.parquet(out).filter(col("yr") === 1995)
    val scan = one.queryExecution.executedPlan.toString()
    assert(one.count() > 0)
    assert(scan.contains("PartitionFilters: [isnotnull(yr"), s"plan: $scan")
  }
}
