package graft.multimodal

import graft.{SparkTestBase, Tables}

class MediaPipelineSpec extends SparkTestBase {

  private def media = {
    implicit val s = spark
    MediaPipeline.fromDocuments(Tables(spark, "/root/testdata/sf0.001", "documents"))
  }

  test("resize produces fixed-size payloads deterministically") {
    val a = MediaPipeline.resize(media, 8).collect().sortBy(_.media_id)
    val b = MediaPipeline.resize(media, 8).collect().sortBy(_.media_id)
    assert(a.forall(_.payload.length <= 64))
    assert(a.map(_.payload.toSeq) sameElements b.map(_.payload.toSeq))
    assert(a.head.declared_format.endsWith("@8x8"))
  }

  test("frame sampling explodes one record into strided frames") {
    val frames = MediaPipeline.sampleFrames(media, frameBytes = 50, stride = 2)
      .collect().groupBy(_.media_id)
    val one = media.collect().head
    val expected = (one.payload.length + 49) / 50 // total windows
    val got = frames(one.media_id).length
    assert(got == (expected + 1) / 2, s"every 2nd of $expected windows, got $got")
    assert(frames(one.media_id).forall(_.frame.length <= 50))
    assert(frames(one.media_id).map(_.frame_idx).forall(_ % 2 == 0))
  }

  test("typed logfile facade returns Dataset[LogRecord]") {
    import graft.sources.logfile.{LogfileFixture, LogfileReader}
    val dir = java.nio.file.Files.createTempDirectory("typed-facade").toFile.getAbsolutePath
    LogfileFixture.ensure(dir, files = 1, recordsPerFile = 100, seed = 8L)
    val ds = LogfileReader.read(spark, dir, LogfileFixture.PatternA)
    val recs = ds.collect()
    assert(recs.length == 200) // plain + gz twin
    assert(recs.forall(r => r.file.nonEmpty && r.offset >= 0 && r.record.nonEmpty))
  }
}
