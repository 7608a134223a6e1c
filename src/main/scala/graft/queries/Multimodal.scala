package graft.queries

import graft.{GraftQuery, QueryPack, Tables}
import graft.multimodal.MediaPipeline
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star ops): binary payloads with typed
  * metadata, partition-wise decode/feature-extract with a clearly-marked
  * stub decoder (no media libs in this container — see
  * [[graft.multimodal.MediaPipeline.decodeStub]]).
  */
object Multimodal extends QueryPack {

  def queries: Seq[GraftQuery] = Seq(
    // Pure-SQL metadata path: binary length + derived fake dimensions are
    // arithmetic on octet counts, so this one IS oracle-checkable.
    GraftQuery(
      "q45_multimodal_binary_metadata",
      (s, dir) => {
        Tables(s, dir, "documents")
          .withColumn("payload", col("text").cast("binary"))
          .select(
            col("doc_id"),
            length(col("payload")).cast("long").as("n_bytes"),
            (length(col("payload")).cast("long") % 512 + 16).as("width"),
            ((length(col("payload")).cast("long") / 512).cast("long") % 512 + 16).as("height"),
            (col("n_chars") % 4 + 1).cast("long").as("channels"),
            upper(col("source")).as("declared_format"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  CAST(octet_length(CAST(text AS BLOB)) % 512 + 16 AS BIGINT) AS width,
        |  CAST((octet_length(CAST(text AS BLOB)) // 512) % 512 + 16 AS BIGINT) AS height,
        |  CAST(n_chars % 4 + 1 AS BIGINT) AS channels,
        |  upper(source) AS declared_format
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Typed Dataset + mapPartitions feature extraction (stub decode).
    // Deterministic but not SQL-expressible → rows-only; pinned in ScalaTest.
    GraftQuery(
      "q46_multimodal_features",
      (s, dir) => {
        implicit val spark = s
        MediaPipeline.extractFeatures(
          MediaPipeline.fromDocuments(Tables(s, dir, "documents")))
          .toDF()
          .withColumn("mean_byte", round(col("mean_byte"), 4))
          .orderBy("media_id")
      },
      None),

    // File-based media ingestion: author real PNGs, read them back with
    // Spark's built-in `binaryFile` source (path/length/content rows — the
    // ingestion format every image-corpus pipeline starts from), and REALLY
    // decode dimensions via MediaPipeline.decodeImage. Deterministic
    // (authored fixtures) but file-based → rows-only; the decode truth is
    // pinned in MediaPipelineSpec and the PNG bytes are authored in-query.
    GraftQuery(
      "q145_binaryfile_ingest",
      (s, dir) => {
        import org.apache.hadoop.fs.Path
        val rootFile = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_bin_${java.util.UUID.randomUUID()}")
        val root = rootFile.getAbsolutePath
        new java.io.File(root).mkdirs()
        try {
          // author deterministic PNG fixtures: sizes derived from index
          (1 to 6).foreach { i =>
            val w = 8 * i
            val h = 4 * i
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var x = 0
            while (x < w) {
              var y = 0
              while (y < h) { img.setRGB(x, y, (x * 37 + y * 11) & 0xffffff); y += 1 }
              x += 1
            }
            javax.imageio.ImageIO.write(img, "png", new java.io.File(root, f"img$i%02d.png"))
          }
          val bin = s.read.format("binaryFile").load(root)
          import s.implicits._
          val decoded = bin
            .select(element_at(split(col("path"), "/"), -1).as("name"),
              col("length"), col("content"))
            .as[(String, Long, Array[Byte])]
            .map { case (name, len, bytes) =>
              val (w, h, c) = MediaPipeline.decodeImage(bytes)
                .getOrElse((-1L, -1L, -1L))
              (name, len, w, h, c)
            }
            .toDF("name", "n_bytes", "width", "height", "channels")
          materializeSmall(decoded.orderBy("name"))
        } finally {
          val fs = new Path(root).getFileSystem(s.sessionState.newHadoopConf())
          fs.delete(new Path(root), true)
        }
      },
      None)
  )
}
