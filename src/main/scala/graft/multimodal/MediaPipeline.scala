package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media record: opaque binary payload + typed metadata. In production the
  * payload is an image/audio/video blob read from parquet `binary` columns;
  * in this container the test corpus has no media files, so payloads are
  * synthesized from document text bytes — the Spark-side plumbing (schema,
  * encoders, partition-wise batch processing) is the real deliverable.
  */
final case class MediaRecord(
    media_id: Long,
    kind: String,
    payload: Array[Byte],
    declared_format: String)

final case class MediaFeatures(
    media_id: Long,
    n_bytes: Long,
    mean_byte: Double,
    width: Long,
    height: Long,
    channels: Long)

object MediaPipeline {

  /** STUB decoder for payloads no real decoder accepts (the synthesized
    * text-byte corpus, and video codecs beyond MJPEG — H.264 etc. need
    * codec libs this container doesn't have). Deterministic fake:
    * dimensions derived from payload size, "pixel" statistics from raw
    * bytes. Swap this body for a real codec call (e.g. ffmpeg bindings) in
    * production; the surrounding partition-wise pipeline does not change.
    * Image (javax.imageio), audio (javax.sound.sampled WAV/PCM), and
    * MJPEG-AVI video ([[decodeVideo]]) decodes are REAL.
    */
  private[multimodal] def decodeStub(payload: Array[Byte]): (Long, Long, Long) = {
    val n = payload.length.toLong
    (n % 512 + 16, (n / 512) % 512 + 16, n % 4 + 1)
  }

  /** REAL image decode via the JDK's built-in javax.imageio (PNG/JPEG/GIF/
    * BMP, no external deps): (width, height, channels) when the payload is a
    * decodable image, None otherwise — callers fall back to the stub, so a
    * corpus of synthesized text-byte payloads still flows end-to-end.
    */
  // in-memory ImageInputStreams: the default file-backed cache writes a
  // temp file to disk PER ImageIO.read call — pure overhead for payloads
  // that are already byte arrays. NOTE: ImageIO.setUseCache is JVM-GLOBAL
  // state — any other ImageIO user in the process also switches to
  // in-memory streams. Fine for this engine's byte-array decodes (and
  // usually for everyone: the disk cache only helps huge streams on
  // memory-starved heaps); scope per-call via an explicit
  // MemoryCacheImageInputStream instead if that ever stops holding.
  javax.imageio.ImageIO.setUseCache(false)

  /** Container-signature pre-screen: the stock JDK readers (PNG/JPEG/GIF/
    * BMP/TIFF/WBMP) each require one of these prefixes before they will
    * decode anything, so a payload matching none of them is rejected
    * WITHOUT the per-call reader-service scan + exception throw — outcome
    * identical to handing it to ImageIO (which would return null), just
    * without paying for the refusal on every record of a text-byte corpus.
    * WBMP's header is the weakest (two zero bytes) and is kept
    * conservatively. STOCK-READERS-ONLY assumption, by design: this engine
    * registers no extra ImageIO/AudioSystem SPI and pins the JDK's own set
    * — a deployment that adds plugin readers (e.g. a WebP SPI) must extend
    * these signature lists with the plugin's container magics (or drop the
    * pre-screen), else plugin-decodable payloads are rejected before the
    * plugin is consulted.
    */
  private def couldBeImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      (p(0) == 0xff.toByte && p(1) == 0xd8.toByte && p(2) == 0xff.toByte) ||
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||
      (p(0) == 'B' && p(1) == 'M') ||
      (p(0) == 'I' && p(1) == 'I' && p(2) == 42 && p(3) == 0) ||
      (p(0) == 'M' && p(1) == 'M' && p(2) == 0 && p(3) == 42) ||
      (p(0) == 0 && p(1) == 0))

  private[graft] def decodeImage(payload: Array[Byte]): Option[(Long, Long, Long)] =
    if (!couldBeImage(payload)) None
    else try {
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
        .map(img => (img.getWidth.toLong, img.getHeight.toLong,
          img.getColorModel.getNumComponents.toLong))
    } catch { case _: Exception => None }

  /** REAL audio decode via the JDK's built-in javax.sound.sampled WAV/PCM
    * reader (RIFF header + sample frames, no external deps). Feature
    * mapping onto the (width, height, channels) triple: width = frame
    * count, height = sample rate in Hz, channels = channel count — the
    * duration/bandwidth facts an audio curation filter keys on. None when
    * the payload is not a parseable WAV — callers fall back to the stub,
    * so a corpus of synthesized text-byte payloads still flows end-to-end.
    */
  /** Same pre-screen for the stock audio readers: WAV (RIFF…WAVE),
    * AIFF/AIFC (FORM…AIF*), AU (.snd) — a payload matching none is what
    * AudioSystem would reject after probing every provider.
    */
  private def couldBeAudio(p: Array[Byte]): Boolean =
    p.length >= 12 && (
      (p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E') ||
      (p(0) == 'F' && p(1) == 'O' && p(2) == 'R' && p(3) == 'M' &&
        p(8) == 'A' && p(9) == 'I' && p(10) == 'F') ||
      (p(0) == '.' && p(1) == 's' && p(2) == 'n' && p(3) == 'd'))

  private[graft] def decodeAudio(payload: Array[Byte]): Option[(Long, Long, Long)] =
    if (!couldBeAudio(payload)) None
    else try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        Some((in.getFrameLength, fmt.getSampleRate.toLong, fmt.getChannels.toLong))
      } finally in.close()
    } catch { case _: Exception => None }

  /** REAL video parse for MJPEG-in-AVI — the RIFF container (a public
    * format: 4-byte chunk id + little-endian size, `LIST`/`RIFF` nodes
    * nest) carrying one JPEG per frame, the one video format the stock JDK
    * can fully decode (frames via javax.imageio). Walks the chunk tree,
    * collects the `##dc`/`##db` frame chunks, and sizes the video from its
    * first decodable frame. Returns (width, height, frame_count); None for
    * anything that isn't a well-formed AVI — callers fall back to the stub.
    */
  private[graft] def decodeVideo(payload: Array[Byte]): Option[(Long, Long, Long)] = {
    val frames = aviFrames(payload)
    if (frames.isEmpty) None
    else frames.iterator.flatMap(decodeImage).buffered.headOption
      .map { case (w, h, _) => (w, h, frames.length.toLong) }
  }

  /** The compressed frame chunks of an AVI payload, container order
    * preserved; empty for non-AVI bytes. Malformed chunk sizes abort the
    * walk (never throw) — partial containers yield the frames seen so far.
    */
  private[multimodal] def aviFrames(payload: Array[Byte]): Vector[Array[Byte]] = {
    def ascii(off: Int) = new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def le32(off: Int): Long =
      (payload(off) & 0xffL) | (payload(off + 1) & 0xffL) << 8 |
        (payload(off + 2) & 0xffL) << 16 | (payload(off + 3) & 0xffL) << 24
    if (payload.length < 12 || ascii(0) != "RIFF" || ascii(8) != "AVI ")
      return Vector.empty
    val out = Vector.newBuilder[Array[Byte]]
    def isFrameId(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        id(2) == 'd' && (id(3) == 'c' || id(3) == 'b')
    def walk(from: Int, to: Int): Unit = {
      var o = from
      while (o + 8 <= to) {
        val id = ascii(o)
        val size = le32(o + 4)
        val dataEnd = o + 8 + size
        if (size < 0 || dataEnd > to) return // malformed: stop, keep what we have
        if (id == "RIFF" || id == "LIST") walk(o + 12, dataEnd.toInt)
        else if (isFrameId(id) && size > 0)
          out += java.util.Arrays.copyOfRange(payload, o + 8, dataEnd.toInt)
        o = (dataEnd + (size & 1)).toInt // chunks pad to even offsets
      }
    }
    walk(12, payload.length)
    out.result()
  }

  /** Synthesize a media table from `documents` (text bytes as payload). */
  def fromDocuments(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("payload"),
      upper(col("source")).as("declared_format"))
      .as[MediaRecord]
  }

  /** Partition-wise feature extraction: one decoder instance per partition
    * (mirrors how a real codec/model handle would be initialized once per
    * task, then stream its batch), no driver-side collection.
    */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition init of a real audio/video codec handle would go here;
      // ImageIO is stateless, so images need none
      it.map { rec =>
        // images, audio, and MJPEG-AVI video get real decoders; payloads
        // the real decoders reject (the synthesized text-byte corpus,
        // non-MJPEG video codecs) take the documented stub
        val (w, h, c) =
          (rec.kind match {
            case "image" => decodeImage(rec.payload)
            case "audio" => decodeAudio(rec.payload)
            case "video" => decodeVideo(rec.payload)
            case _ => None
          }).getOrElse(decodeStub(rec.payload))
        val mean =
          if (rec.payload.isEmpty) 0.0
          else {
            // primitive while-loop: foldLeft boxes every byte, and this
            // runs once per payload byte of the whole corpus
            var s = 0L; var i = 0
            while (i < rec.payload.length) { s += rec.payload(i) & 0xff; i += 1 }
            s.toDouble / rec.payload.length
          }
        MediaFeatures(rec.media_id, rec.payload.length.toLong, mean, w, h, c)
      }
    }
  }

  /** REAL image rescale for decodable payloads (headless AWT bilinear →
    * PNG re-encode, no external deps); other kinds and undecodable
    * payloads take the documented deterministic byte-downsample stub so
    * the batch shape (one fixed-size output per record, partition-
    * streamed) is exercised either way.
    */
  private[multimodal] def resizeImage(payload: Array[Byte], target: Int): Option[Array[Byte]] =
    try {
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))).map { img =>
        val out = new java.awt.image.BufferedImage(
          target, target, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, target, target, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }
    } catch { case _: Exception => None }

  def resize(ds: Dataset[MediaRecord], target: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    val n = target * target
    ds.mapPartitions { it =>
      it.map { rec =>
        val resized =
          (if (rec.kind == "image") resizeImage(rec.payload, target) else None)
            .getOrElse {
              // stub path: deterministic byte downsample to target² samples
              val src = rec.payload
              val out = new Array[Byte](math.min(n, math.max(src.length, 1)))
              var i = 0
              while (i < out.length) {
                out(i) = if (src.isEmpty) 0 else src((i.toLong * src.length / out.length).toInt)
                i += 1
              }
              out
            }
        rec.copy(payload = resized,
          declared_format = s"${rec.declared_format}@${target}x$target")
      }
    }
  }

  /** Frame sampling, REAL for MJPEG-AVI payloads: every `stride`-th
    * container frame becomes one record carrying its actual JPEG bytes.
    * Non-AVI payloads take the documented stub (every `stride`-th
    * fixed-size byte window) so the row-explosion shape (1 → N rows) is
    * exercised by the synthesized corpus too.
    */
  def sampleFrames(ds: Dataset[MediaRecord], frameBytes: Int,
      stride: Int): Dataset[MediaFrame] = {
    import ds.sparkSession.implicits._
    def meanByte(b: Array[Byte]): Double =
      if (b.isEmpty) 0.0
      else b.foldLeft(0L)((a, x) => a + (x & 0xff)).toDouble / b.length
    ds.flatMap { rec =>
      val real = aviFrames(rec.payload)
      val frames = if (real.nonEmpty) real else rec.payload.grouped(frameBytes).toSeq
      frames.indices.collect {
        case i if i % stride == 0 =>
          MediaFrame(rec.media_id, i.toLong, frames(i), meanByte(frames(i)))
      }
    }
  }
}

final case class MediaFrame(
    media_id: Long, frame_idx: Long, frame: Array[Byte], mean_byte: Double)
