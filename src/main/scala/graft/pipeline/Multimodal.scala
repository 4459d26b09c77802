package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media payloads
  * travel as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract / frame-sample run per-partition so codec state is
  * constructed once per partition (the Spark-side shape that matters —
  * schema, partitioning, batch iteration). The actual image/audio codec is
  * STUBBED (no media libraries in this container): `decodeStub` derives
  * deterministic pseudo-features from the bytes and marks the real decode
  * boundary.
  */
object Multimodal {

  /** One media row: payload + typed metadata (mime + declared dims). */
  case class MediaRow(media_id: Long, payload: Array[Byte], mime: String,
      declared_w: Int, declared_h: Int)

  /** Extracted features; `decoded` would be the pixel/sample tensor. */
  case class MediaFeatures(media_id: Long, n_bytes: Long, checksum: Long,
      n_frames: Long, mime: String)

  /** Deterministic stand-in for a real decoder. The marked line is where
    * an image/audio library call goes (one codec instance per partition). */
  def decodeStub(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // val codec = RealCodec.open()   // per-partition init goes here
      rows.map { r =>
        // REAL DECODE STUBBED: pixels = codec.decode(r.payload)
        val checksum = r.payload.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
        MediaFeatures(r.media_id, r.payload.length.toLong, checksum,
          n_frames = ((r.payload.length + 255) / 256).toLong, r.mime)
      }
    }
  }

  /** Frame sampling: deterministic every-k-th slice of the payload —
    * the partition/batch shape of real video frame extraction. */
  def frameSample(ds: Dataset[MediaRow], frameBytes: Int, everyK: Int)
      : DataFrame = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex.collect {
        case (chunk, i) if i % everyK == 0 => (r.media_id, i, chunk.length)
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** Builds a media table from the documents text (utf-8 payloads) — the
    * stand-in corpus for the binary-column pipeline. */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("text/plain").as("mime"),
        lit(0).as("declared_w"), lit(0).as("declared_h"))
      .as[MediaRow]
  }
}
