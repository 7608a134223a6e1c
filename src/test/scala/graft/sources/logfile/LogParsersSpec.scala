package graft.sources.logfile

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.SparkTestBase

class LogParsersSpec extends SparkTestBase {

  private def readWith(dir: String, layout: LogParsers.Layout) =
    LogParsers.parse(
      spark.read.format("logfile")
        .option("pattern", layout.headPattern).load(dir),
      layout)

  test("log4j layout parses ts/level/msg from multiline records") {
    val dir = Files.createTempDirectory("parsers-log4j").toFile.getAbsolutePath
    Files.write(new File(dir, "a.log").toPath,
      ("2017-01-02 03:04:05,678 ERROR [main] com.example.App - boom happened\n" +
        "java.lang.IllegalStateException: x\n\tat a.B.c(B.java:1)\n" +
        "2017-01-02 03:04:05,680 INFO [main] com.example.App - recovered\n")
        .getBytes(StandardCharsets.UTF_8))
    val rows = readWith(dir, LogParsers.Log4jDefault).orderBy("offset").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("level") == "ERROR")
    assert(rows(0).getAs[String]("msg") == "boom happened")
    assert(rows(0).getAs[Long]("n_lines") == 3)
    assert(rows(0).getAs[java.sql.Timestamp]("ts").toString == "2017-01-02 03:04:05.678")
    assert(rows(1).getAs[String]("level") == "INFO")
  }

  test("level-first and iso8601 layouts parse their shapes") {
    val dir = Files.createTempDirectory("parsers-more").toFile.getAbsolutePath
    Files.write(new File(dir, "b.log").toPath,
      "WARN 2017-01-02 03:04:05,678 [w-1] queue nearly full\n"
        .getBytes(StandardCharsets.UTF_8))
    val b = readWith(dir, LogParsers.LevelFirst).collect()(0)
    assert(b.getAs[String]("level") == "WARN")
    assert(b.getAs[String]("msg") == "queue nearly full")

    val dir2 = Files.createTempDirectory("parsers-iso").toFile.getAbsolutePath
    Files.write(new File(dir2, "c.log").toPath,
      "2017-01-02T03:04:05.678Z INFO started up\ncontinuation\n"
        .getBytes(StandardCharsets.UTF_8))
    val c = readWith(dir2, LogParsers.Iso8601).collect()(0)
    assert(c.getAs[String]("level") == "INFO")
    assert(c.getAs[String]("msg") == "started up")
    assert(c.getAs[Long]("n_lines") == 2)
  }
}
