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
      None)
  )
}
