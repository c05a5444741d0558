package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed in partition-sized batches.
  *
  * The Spark-side shape is real and tested — schema (`payload binary` +
  * metadata struct), partitioning, batch iteration via typed
  * `mapPartitions` (the JVM analogue of `mapInPandas`: one invocation per
  * partition, streaming iterator in/out, no per-row overhead). The decode
  * itself is REAL for the formats the JDK ships readers for ([[ImageIoCodec]]
  * — PNG/JPEG/GIF/BMP via `javax.imageio`, header-only reads, zero new
  * dependencies); payloads that are not decodable images fall back to the
  * deterministic [[FakeCodec]] so the synthetic text-payload fixtures (and
  * their DuckDB oracles) keep exercising the full data path.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], format: String)
  case class DecodedRow(doc_id: Long, byte_len: Long, width: Long,
                        height: Long, n_frames: Long, format: String)

  /** Fallback codec for payloads that are not decodable images (the
    * synthetic text-payload fixtures, unknown/audio formats). Deterministic
    * pure function of payload length so outputs are oracle-checkable.
    */
  object FakeCodec {
    def decode(payload: Array[Byte], format: String): (Long, Long, Long) = {
      val n = payload.length.toLong
      (n % 640 + 16, (n * 7) % 480 + 16, n % 24 + 1)
    }
  }

  /** REAL image decode via the JDK's built-in `javax.imageio` — no new
    * dependencies. Magic-byte sniff first (PNG `\x89PNG`, JPEG `FFD8FF`,
    * GIF `GIF8`, BMP `BM`) so the ImageIO reader lookup only runs on
    * plausible image bytes; then a HEADER-ONLY read (`ImageReader.getWidth/
    * getHeight` never decode pixel data) — the at-scale contract for a
    * metadata pass over 100 TB of media is to touch headers, not rasters.
    * Frame count uses the reader's cheap path (`getNumImages(false)`,
    * falling back to a counting search only for multi-image containers like
    * animated GIF, whose files are small). Any parse failure — including
    * text that happens to start with a magic sequence — falls back to
    * [[FakeCodec]], so the operator never throws on hostile bytes.
    *
    * Text-payload hardening: the GIF and BMP magic bytes are pure ASCII
    * ("GIF8", "BM"), and the JDK GIF reader can parse ASCII text starting
    * "GIF89a" to garbage dimensions WITHOUT throwing (0x2C — a comma — is
    * GIF's image-separator byte), which would silently diverge from the
    * FakeCodec formula the oracles replicate. Three guards close that:
    * the GIF sniff requires the full 6-byte signature (`GIF87a`/`GIF89a`);
    * a payload whose first 64 bytes are ALL printable ASCII is classified
    * as text and routed to [[FakeCodec]] before any reader runs (a real
    * GIF/BMP header carries control bytes in its packed dimension/offset
    * fields — a fully-printable prefix is text, not an image); for the
    * ASCII-magic formats (GIF/BMP) the header must additionally contain a
    * byte < 0x09 in its first 14 bytes — text (any encoding, including
    * multi-byte UTF-8) never contains such bytes, while a real GIF header
    * has them in the dimension high bytes / background / aspect fields
    * (any dimension < 2304 guarantees one) and a real BMP's reserved
    * bytes 6-9 are zero by spec; and decoded dimensions outside
    * `[1, 2²⁰]` are rejected as implausible, falling back to
    * [[FakeCodec]]. (A dimension bound alone cannot reject garbage GIF
    * parses — GIF dims are 16-bit, always under any plausibility bound.)
    *
    * Deliberate precision/recall trade: an exotic real GIF can evade the
    * control-byte guarantee (both dimensions ≥ 2304 AND background index
    * ≥ 9 AND a nonzero aspect byte) and be misrouted to [[FakeCodec]] —
    * the SAFE direction (deterministic fallback metadata) — whereas
    * weakening the guard re-admits the silent garbage-dimension parse of
    * text payloads, the UNSAFE direction this codec exists to prevent.
    */
  object ImageIoCodec {
    private def isImageMagic(p: Array[Byte]): Boolean =
      (p.length >= 8 && (p(0) & 0xFF) == 0x89 && p(1) == 'P' &&
        p(2) == 'N' && p(3) == 'G') ||
      (p.length >= 3 && (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8 &&
        (p(2) & 0xFF) == 0xFF) ||
      (p.length >= 6 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' &&
        p(3) == '8' && (p(4) == '7' || p(4) == '9') && p(5) == 'a') ||
      (p.length >= 2 && p(0) == 'B' && p(1) == 'M')

    private def looksLikeText(p: Array[Byte]): Boolean = {
      val n = math.min(p.length, 64)
      var i = 0
      while (i < n) {
        val b = p(i) & 0xFF
        if (b != 0x09 && b != 0x0A && b != 0x0D && (b < 0x20 || b > 0x7E))
          return false
        i += 1
      }
      true
    }

    /** Bytes < 0x09 never occur in text of any encoding (UTF-8 multi-byte
      * sequences are all ≥ 0x80; controls below TAB are not text) but are
      * structurally guaranteed in real GIF/BMP headers — the discriminator
      * for the two ASCII-magic formats that `looksLikeText` alone cannot
      * classify when the payload mixes ASCII with multi-byte characters.
      */
    private def hasHeaderControlByte(p: Array[Byte]): Boolean = {
      val n = math.min(p.length, 14)
      var i = 0
      while (i < n) {
        if ((p(i) & 0xFF) < 0x09) return true
        i += 1
      }
      false
    }

    private val MaxDim = 1L << 20

    def decode(payload: Array[Byte], format: String): (Long, Long, Long) = {
      if (!isImageMagic(payload) || looksLikeText(payload))
        return FakeCodec.decode(payload, format)
      if ((payload(0) == 'G' || payload(0) == 'B') &&
          !hasHeaderControlByte(payload))
        return FakeCodec.decode(payload, format)
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      // createImageInputStream returns NULL (not an exception) when no
      // ImageInputStream SPI accepts the input — the finally close would
      // NPE past the fallback and kill the partition task
      if (in == null) return FakeCodec.decode(payload, format)
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) FakeCodec.decode(payload, format)
        else {
          val r = readers.next()
          try {
            r.setInput(in)
            val w = r.getWidth(0).toLong
            val h = r.getHeight(0).toLong
            if (w < 1 || w > MaxDim || h < 1 || h > MaxDim)
              FakeCodec.decode(payload, format) // implausible header parse
            else {
              val cheap = r.getNumImages(false)
              val frames =
                if (cheap > 0) cheap.toLong
                else if (payload(0) == 'G') r.getNumImages(true).toLong
                else 1L
              (w, h, math.max(frames, 1L))
            }
          } finally r.dispose()
        }
      } catch {
        case scala.util.control.NonFatal(_) => FakeCodec.decode(payload, format)
      } finally in.close()
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

  /** Batch decode: typed mapPartitions — the real plumbing under any
    * decode/resize/frame-sample stage. Each partition's rows stream through
    * one codec invocation context (per-partition init amortizes library
    * setup per batch, exactly like `mapInPandas` batch semantics). Real
    * image bytes decode through [[ImageIoCodec]]; everything else takes the
    * deterministic [[FakeCodec]] fallback.
    */
  def decodeBatches(spark: SparkSession, media: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init would go here (codec handles, model weights…);
      // ImageIO's reader registry is JVM-static, so nothing to set up
      rows.map { r =>
        val (w, h, f) = ImageIoCodec.decode(r.payload, r.format)
        DecodedRow(r.doc_id, r.payload.length.toLong, w, h, f, r.format)
      }
    }
  }
}
