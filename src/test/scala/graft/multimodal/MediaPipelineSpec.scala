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

  test("image kind decodes a genuine PNG via javax.imageio; others keep the stub") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    implicit val s = spark
    import s.implicits._
    // author a real 13x7 RGB PNG in memory — decoded dims must be the truth,
    // not the size-derived stub values
    val img = new BufferedImage(13, 7, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 13; y <- 0 until 7) img.setRGB(x, y, (x * 31 + y) << 8)
    val baos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    val png = baos.toByteArray

    val ds = Seq(
      MediaRecord(1L, "image", png, "PNG"),
      MediaRecord(2L, "audio", png, "PNG"), // wrong kind → stub even for real bytes
      MediaRecord(3L, "image", "not an image".getBytes, "PNG") // undecodable → stub
    ).toDS()
    val feats = MediaPipeline.extractFeatures(ds).collect().sortBy(_.media_id)

    assert((feats(0).width, feats(0).height, feats(0).channels) == ((13L, 7L, 3L)),
      s"real decode expected, got ${feats(0)}")
    val stub2 = MediaPipeline.decodeStub(png)
    assert((feats(1).width, feats(1).height, feats(1).channels) == stub2)
    val stub3 = MediaPipeline.decodeStub("not an image".getBytes)
    assert((feats(2).width, feats(2).height, feats(2).channels) == stub3)
  }

  test("audio kind decodes a genuine WAV via javax.sound; non-WAV keeps the stub") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    implicit val s = spark
    import s.implicits._
    // author a real 16-bit PCM WAV in memory: 1234 frames, 8 kHz, stereo —
    // decoded features must be the header truth, not size-derived stubs
    def wav(frames: Int, rate: Float, channels: Int): Array[Byte] = {
      val fmt = new AudioFormat(rate, 16, channels, true, false)
      val pcm = new Array[Byte](frames * fmt.getFrameSize)
      var i = 0
      while (i < pcm.length) { pcm(i) = ((i * 37) % 251 - 125).toByte; i += 1 }
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val baos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }
    val stereo = wav(1234, 8000f, 2)
    val mono = wav(400, 44100f, 1)
    val ds = Seq(
      MediaRecord(1L, "audio", stereo, "WAV"),
      MediaRecord(2L, "audio", mono, "WAV"),
      MediaRecord(3L, "audio", "definitely not riff".getBytes, "WAV"),
      MediaRecord(4L, "video", stereo, "WAV") // wrong kind → stub
    ).toDS()
    val feats = MediaPipeline.extractFeatures(ds).collect().sortBy(_.media_id)
    // (width, height, channels) = (frames, sample rate, channels) for audio
    assert((feats(0).width, feats(0).height, feats(0).channels) == ((1234L, 8000L, 2L)),
      s"real WAV decode expected, got ${feats(0)}")
    assert((feats(1).width, feats(1).height, feats(1).channels) == ((400L, 44100L, 1L)))
    val stub3 = MediaPipeline.decodeStub("definitely not riff".getBytes)
    assert((feats(2).width, feats(2).height, feats(2).channels) == stub3)
    val stub4 = MediaPipeline.decodeStub(stereo)
    assert((feats(3).width, feats(3).height, feats(3).channels) == stub4)
  }

  test("resize really rescales a decodable image; stub path for the rest") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    implicit val s = spark
    import s.implicits._
    val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 32; y <- 0 until 32) img.setRGB(x, y, (x * 8) << 16 | (y * 8))
    val baos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    val png = baos.toByteArray

    val ds = Seq(
      MediaRecord(1L, "image", png, "PNG"),
      MediaRecord(2L, "audio", png, "PNG")).toDS()
    val out = MediaPipeline.resize(ds, 16).collect().sortBy(_.media_id)
    // the image record's payload is a REAL 16x16 PNG
    val back = ImageIO.read(new java.io.ByteArrayInputStream(out(0).payload))
    assert(back != null && back.getWidth == 16 && back.getHeight == 16,
      s"expected a decodable 16x16 PNG, got ${out(0).payload.length} bytes")
    // the audio record took the byte-downsample stub (16² samples)
    assert(out(1).payload.length == 256)
    assert(out.forall(_.declared_format.endsWith("@16x16")))
    // deterministic re-encode: same input, same bytes
    val again = MediaPipeline.resize(ds, 16).collect().sortBy(_.media_id)
    assert(out(0).payload.toSeq == again(0).payload.toSeq)
  }

  test("video kind decodes a genuine MJPEG-AVI; frames sample for real") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    implicit val s = spark
    import s.implicits._
    // author a real MJPEG AVI in memory: RIFF('AVI ') with an hdrl LIST and
    // a movi LIST of three 00dc JPEG frames (11x5 each, distinct content)
    def jpeg(seed: Int): Array[Byte] = {
      val img = new BufferedImage(11, 5, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 11; y <- 0 until 5) img.setRGB(x, y, (x * seed + y * 7) << 8)
      val b = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "jpg", b)
      b.toByteArray
    }
    val frames = Seq(jpeg(17), jpeg(29), jpeg(43))
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ body)
    val hdrl = list("hdrl", chunk("avih", new Array[Byte](56)))
    val movi = list("movi", frames.map(chunk("00dc", _)).reduce(_ ++ _))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val avi = "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body

    // container parse: exactly the three authored frames, byte-identical
    val parsed = MediaPipeline.aviFrames(avi)
    assert(parsed.length == 3)
    assert(parsed.map(_.toSeq) == frames.map(_.toSeq))
    assert(MediaPipeline.aviFrames("not a riff container".getBytes).isEmpty)

    // extractFeatures: real dimensions from the first frame + frame count,
    // NOT the size-derived stub triple
    val ds = Seq(
      MediaRecord(1L, "video", avi, "AVI"),
      MediaRecord(2L, "video", "not a video".getBytes, "AVI")).toDS()
    val feats = MediaPipeline.extractFeatures(ds).collect().sortBy(_.media_id)
    assert((feats(0).width, feats(0).height, feats(0).channels) == (11L, 5L, 3L))
    val stub = MediaPipeline.decodeStub("not a video".getBytes)
    assert((feats(1).width, feats(1).height, feats(1).channels) == stub)

    // sampleFrames on an AVI: every 2nd CONTAINER frame (0 and 2), each a
    // decodable JPEG with the authored dimensions
    val sampled = MediaPipeline.sampleFrames(Seq(MediaRecord(1L, "video", avi, "AVI")).toDS(),
      frameBytes = 64, stride = 2).collect().sortBy(_.frame_idx)
    assert(sampled.map(_.frame_idx).toSeq == Seq(0L, 2L))
    assert(sampled.forall(f => MediaPipeline.decodeImage(f.frame).contains((11L, 5L, 3L))))
    assert(sampled(0).frame.toSeq == frames(0).toSeq && sampled(1).frame.toSeq == frames(2).toSeq)
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
