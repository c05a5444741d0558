package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed in partition-sized batches.
  *
  * The Spark-side shape is real and tested — schema (`payload binary` +
  * metadata struct), partitioning, batch iteration via typed
  * `mapPartitions` (the JVM analogue of `mapInPandas`: one invocation per
  * partition, streaming iterator in/out, no per-row overhead). The actual
  * media decode is STUBBED ([[FakeCodec]]) because no image/audio libraries
  * exist in this container: it derives deterministic pseudo-metadata from
  * the payload bytes, exercising exactly the data path a real codec would.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], format: String)
  case class DecodedRow(doc_id: Long, byte_len: Long, width: Long,
                        height: Long, n_frames: Long, format: String)

  /** STUB — stands in for a real image/audio decoder. Deterministic pure
    * function of payload length so outputs are oracle-checkable.
    */
  object FakeCodec {
    def decode(payload: Array[Byte], format: String): (Long, Long, Long) = {
      val n = payload.length.toLong
      (n % 640 + 16, (n * 7) % 480 + 16, n % 24 + 1)
    }
  }

  /** Attach a binary payload column (UTF-8 bytes of the text column — a
    * stand-in for real media bytes) plus a format tag derived from source.
    */
  def asMedia(df: DataFrame, idCol: String, textCol: String,
              sourceCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      // null text → empty payload (a null payload would NPE the typed
      // decode path)
      encode(coalesce(col(textCol), lit("")), "UTF-8").as("payload"),
      concat(lit("img/"), coalesce(col(sourceCol), lit("unknown")))
        .as("format"))

  /** Bridge the `binaryFile` source ([[graft.io.Sources.binaryFiles]])
    * into the media shape: id = stable hash of the file path (xxhash64 —
    * reproducible across runs and listings), format from the extension.
    * This is how REAL media bytes enter the decode pipeline; the text
    * stand-in ([[asMedia]]) exists only because the container has no media
    * fixtures.
    */
  def asMediaFromFiles(files: DataFrame): DataFrame =
    files.select(
      xxhash64(col("path")).as("doc_id"),
      col("content").as("payload"),
      concat(lit("img/"),
        lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1)))
        .as("format"))

  case class ResizedRow(doc_id: Long, width: Long, height: Long,
                        target_w: Long, target_h: Long, scale: Double)
  case class FrameRow(doc_id: Long, frame_idx: Long, frame_hash: Long)

  /** STUB resize: computes the letterboxed target geometry a real resizer
    * would use (aspect-preserving fit into maxW×maxH) — all the planning
    * math, none of the pixels.
    */
  def resizeMeta(spark: SparkSession, decoded: Dataset[DecodedRow],
                 maxW: Long, maxH: Long): Dataset[ResizedRow] = {
    import spark.implicits._
    decoded.map { r =>
      val scale = math.min(maxW.toDouble / r.width, maxH.toDouble / r.height)
      val s = math.min(scale, 1.0)
      ResizedRow(r.doc_id, r.width, r.height,
        math.max(1L, (r.width * s).toLong), math.max(1L, (r.height * s).toLong), s)
    }
  }

  /** STUB frame sampling: every k-th frame index plus a deterministic
    * pseudo-hash per frame (stands in for a decoded keyframe digest).
    * `flatMap` = the 1→N row shape a real frame extractor produces.
    */
  def frameSample(spark: SparkSession, decoded: Dataset[DecodedRow],
                  everyK: Long): Dataset[FrameRow] = {
    import spark.implicits._
    decoded.flatMap { r =>
      (0L until r.n_frames by everyK).map(i =>
        FrameRow(r.doc_id, i, r.byte_len * 31L + i))
    }
  }

  /** Batch "decode": typed mapPartitions — the real plumbing under any
    * decode/resize/frame-sample stage. Each partition's rows stream through
    * one codec invocation context (where a real codec would amortize model/
    * library init per batch, exactly like `mapInPandas` batch semantics).
    */
  def decodeBatches(spark: SparkSession, media: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init would go here (codec handles, model weights…)
      rows.map { r =>
        val (w, h, f) = FakeCodec.decode(r.payload, r.format)
        DecodedRow(r.doc_id, r.payload.length.toLong, w, h, f, r.format)
      }
    }
  }
}
