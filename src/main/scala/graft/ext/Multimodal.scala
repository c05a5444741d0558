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
  * — PNG/JPEG/GIF/BMP/TIFF via `javax.imageio`, header-only reads, zero new
  * dependencies), and so are the raster stages: [[resizeMedia]] resamples
  * actual pixels through `Graphics2D` and re-encodes PNG bytes;
  * [[frameExtract]] decodes every sampled frame of a multi-image container
  * and digests its raster. Payloads that are not decodable images fall back
  * to the deterministic [[FakeCodec]] so the synthetic text-payload fixtures
  * (and their DuckDB oracles) keep exercising the full data path.
  */
object Multimodal {

  // Every codec call here reads/writes in-memory byte arrays, but
  // javax.imageio's STREAM factories default to DISK-backed caches:
  // createImageInputStream / createImageOutputStream (and ImageIO.write's
  // internal wrap) spill EVERY payload to a temp file and read it back —
  // one create/write/read/delete syscall cycle per image. Measured (r19):
  // that put q_multimodal_resize's executor CPU anywhere between 16 and
  // 99 cpu-s at sf0.1 depending on filesystem/writeback state left by
  // whatever ran before it (isolated 16.5; 45-85 right after the
  // corpus-family's index/checkpoint writes) — per-query numbers swung
  // ±5× on untouched code. In-memory stream caching removes the temp-file
  // cycle entirely; decoded/encoded BYTES are bit-identical (the cache
  // choice never affects codec output — oracle-gated regardless), and the
  // heap cost is bounded by the same MaxRasterPixels/payload-size guards
  // the codecs already enforce.
  useInMemoryImageIOStreams()

  /** PROCESS-WIDE JVM setting (documented side effect — see README
    * "Multimodal"): switches `javax.imageio`'s stream factories from
    * disk-backed to in-memory caches for the whole JVM, not just this
    * object. Graft is this library's only ImageIO user and all its
    * payloads are size-guarded byte arrays, so in-memory is strictly
    * better here; an embedding application that also runs ImageIO over
    * very large images and relies on disk-backed streams can restore the
    * default with `ImageIO.setUseCache(true)` AFTER first touching this
    * object (decoded/encoded bytes are identical either way — only the
    * temp-file spill behavior changes). Runs once at object init.
    */
  def useInMemoryImageIOStreams(): Unit =
    javax.imageio.ImageIO.setUseCache(false)

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
      (p.length >= 2 && p(0) == 'B' && p(1) == 'M') ||
      // TIFF (the JDK ships a TIFF plugin since Java 9): II*\0 / MM\0*;
      // both signatures carry a 0x00 in the first four bytes, so the
      // looksLikeText guard can never misroute a real TIFF
      (p.length >= 4 && p(0) == 'I' && p(1) == 'I' &&
        (p(2) & 0xFF) == 0x2A && p(3) == 0) ||
      (p.length >= 4 && p(0) == 'M' && p(1) == 'M' && p(2) == 0 &&
        (p(3) & 0xFF) == 0x2A)

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

    /** The shared routing decision: does this payload plausibly hold image
      * bytes the JDK can read? All three text-hardening guards in one place
      * so the header pass, the raster resize, and the frame extractor agree
      * on which codec a payload takes.
      */
    private[ext] def isPlausibleImage(payload: Array[Byte]): Boolean =
      isImageMagic(payload) && !looksLikeText(payload) &&
        !((payload(0) == 'G' || payload(0) == 'B') &&
          !hasHeaderControlByte(payload))

    def decode(payload: Array[Byte], format: String): (Long, Long, Long) = {
      if (!isPlausibleImage(payload))
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
                else if (payload(0) == 'G' || payload(0) == 'I' ||
                         payload(0) == 'M') r.getNumImages(true).toLong
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
                        resized_w: Long, resized_h: Long, scale: Double,
                        raster: Boolean, resized_bytes: Array[Byte])
  case class FrameRow(doc_id: Long, frame_idx: Long, frame_w: Long,
                      frame_h: Long, frame_hash: Long, raster: Boolean)

  /** Aspect-preserving letterbox fit of `w×h` into `maxW×maxH`, never
    * upscaling. Integer-exact across engines: two IEEE double divisions, a
    * min, a multiply, a floor — DuckDB's
    * `least(1.0, least(maxW/w, maxH/h))` then `greatest(1, floor(w*s))`
    * reproduces every bit, so resized dimensions are oracle-checkable.
    */
  def letterbox(w: Long, h: Long, maxW: Long, maxH: Long): (Long, Long, Double) = {
    val s = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
    (math.max(1L, (w * s).toLong), math.max(1L, (h * s).toLong), s)
  }

  /** REAL raster operations over the JDK's imaging stack — full-frame
    * decode (`ImageIO.read`-level, via the same reader registry as the
    * header pass), `Graphics2D` bilinear resample into the letterboxed
    * target, PNG re-encode. Zero new dependencies. The full-raster path is
    * bounded: payloads whose HEADER dimensions exceed [[MaxRasterPixels]]
    * are refused before any pixel allocation (the at-scale contract — a
    * hostile 2³⁰-pixel header must not OOM an executor; such rows take the
    * geometry-only fallback and are flagged `raster = false`).
    */
  object RasterCodec {
    /** Decoded-pixel budget per frame (16 MP ≈ 64 MB ARGB) — chosen so a
      * 32-thread executor resizing concurrently stays ~2 GB peak raster.
      */
    val MaxRasterPixels: Long = 1L << 24
    /** Frame-count cap for multi-image containers (runaway-header guard). */
    val MaxFrames: Long = 4096L

    private def withReader[A](payload: Array[Byte])(
        f: javax.imageio.ImageReader => Option[A]): Option[A] = {
      if (!ImageIoCodec.isPlausibleImage(payload)) return None
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      if (in == null) return None
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try { r.setInput(in); f(r) } finally r.dispose()
        }
      } catch {
        case scala.util.control.NonFatal(_) => None
      } finally in.close()
    }

    /** FNV-1a over the RGB raster in row-major order — the keyframe digest
      * a dedup/sampling stage keys on. Cost is linear in pixels, the same
      * order as the decode that produced them.
      */
    def rasterHash(img: java.awt.image.BufferedImage): Long = {
      var h = -3750763034362895579L // FNV-1a 64-bit offset basis
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          h = (h ^ (img.getRGB(x, y) & 0xFFFFFF).toLong) * 1099511628211L
          x += 1
        }
        y += 1
      }
      h
    }

    /** Decode → letterbox-resize → PNG-encode → header-verify, one frame.
      * Returns `(pngBytes, outW, outH)` where `outW/outH` are RE-DECODED
      * from the produced PNG (the honest evidence that real pixels moved),
      * or None when the payload is not a raster-decodable image within the
      * pixel budget.
      */
    def resizePng(payload: Array[Byte], maxW: Long,
                  maxH: Long): Option[(Array[Byte], Long, Long)] =
      withReader(payload) { r =>
        val w = r.getWidth(0).toLong
        val h = r.getHeight(0).toLong
        if (w < 1 || h < 1 || w * h > MaxRasterPixels) None
        else {
          val img = r.read(0)
          val (tw, th, _) = letterbox(w, h, maxW, maxH)
          val out = new java.awt.image.BufferedImage(tw.toInt, th.toInt,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, tw.toInt, th.toInt, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          if (!javax.imageio.ImageIO.write(out, "png", bos)) None
          else {
            val png = bos.toByteArray
            // verify by re-decoding the header of what we just wrote
            val (vw, vh, _) = ImageIoCodec.decode(png, "img/png")
            Some((png, vw, vh))
          }
        }
      }

    /** Decode every k-th frame of a multi-image container (animated GIF,
      * multi-page TIFF), returning per-frame `(idx, w, h, rasterHash)` from
      * the ACTUAL decoded rasters. None when not raster-decodable.
      */
    def readFrames(payload: Array[Byte],
                   everyK: Long): Option[Seq[(Long, Long, Long, Long)]] =
      withReader(payload) { r =>
        val n = math.min(math.max(r.getNumImages(true).toLong, 1L), MaxFrames)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
        var i = 0L
        var overBudget = false
        while (i < n && !overBudget) {
          val w = r.getWidth(i.toInt).toLong
          val h = r.getHeight(i.toInt).toLong
          if (w < 1 || h < 1 || w * h > MaxRasterPixels) overBudget = true
          else {
            val img = r.read(i.toInt)
            out += ((i, img.getWidth.toLong, img.getHeight.toLong,
              rasterHash(img)))
            i += everyK
          }
        }
        if (overBudget) None else Some(out.toSeq)
      }
  }

  /** REAL resize: aspect-preserving raster resample of each payload into
    * `maxW×maxH` via [[RasterCodec.resizePng]] — actual pixels through
    * `Graphics2D`, PNG bytes out, output dimensions re-decoded from the
    * produced PNG. Payloads that are not raster-decodable images (the text
    * fixtures, hostile bytes, over-budget rasters) take the deterministic
    * geometry-only fallback — [[ImageIoCodec.decode]] dimensions through
    * the same [[letterbox]] math, empty payload, `raster = false` — so the
    * operator is total and every row stays oracle-checkable.
    */
  def resizeMedia(spark: SparkSession, media: DataFrame, maxW: Long,
                  maxH: Long): Dataset[ResizedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { m =>
        RasterCodec.resizePng(m.payload, maxW, maxH) match {
          case Some((png, vw, vh)) =>
            val (w, h, _) = ImageIoCodec.decode(m.payload, m.format)
            val (_, _, s) = letterbox(w, h, maxW, maxH)
            ResizedRow(m.doc_id, w, h, vw, vh, s, raster = true, png)
          case None =>
            val (w, h, _) = ImageIoCodec.decode(m.payload, m.format)
            val (tw, th, s) = letterbox(w, h, maxW, maxH)
            ResizedRow(m.doc_id, w, h, tw, th, s, raster = false,
              Array.emptyByteArray)
        }
      }
    }
  }

  /** REAL frame sampling: every k-th frame of each payload decoded via
    * [[RasterCodec.readFrames]] — actual per-frame rasters, dimensions and
    * FNV digest from the decoded pixels. Non-raster payloads fall back to
    * the deterministic pseudo-frame formula over [[ImageIoCodec.decode]]
    * metadata (`raster = false`), preserving the 1→N `flatMap` shape and
    * oracle-checkability for the text fixtures.
    */
  def frameExtract(spark: SparkSession, media: DataFrame,
                   everyK: Long): Dataset[FrameRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { m =>
        RasterCodec.readFrames(m.payload, everyK) match {
          case Some(frames) =>
            frames.map { case (i, w, h, hash) =>
              FrameRow(m.doc_id, i, w, h, hash, raster = true)
            }
          case None =>
            val (w, h, nf) = ImageIoCodec.decode(m.payload, m.format)
            val len = m.payload.length.toLong
            (0L until nf by everyK).map(i =>
              FrameRow(m.doc_id, i, w, h, len * 31L + i, raster = false))
        }
      }
    }
  }

  /** Deterministic REAL-image fixtures derived from the documents table —
    * the container ships no media files, so the raster path is exercised by
    * synthesizing actual PNG / multi-page-TIFF bytes on the executors whose
    * GEOMETRY is a pure integer function of fixture columns. The DuckDB
    * oracles predict that geometry in SQL; a hash-exact match on the
    * re-decoded output dimensions therefore proves the full
    * decode→resample→encode→decode chain ran on real pixels.
    */
  object Synthetic {
    private def fill(img: java.awt.image.BufferedImage, rgb: Int): Unit = {
      val g = img.createGraphics()
      try {
        g.setColor(new java.awt.Color(rgb))
        g.fillRect(0, 0, img.getWidth, img.getHeight)
        // a contrasting diagonal so the bilinear resample has structure
        g.setColor(new java.awt.Color(~rgb & 0xFFFFFF))
        g.drawLine(0, 0, img.getWidth - 1, img.getHeight - 1)
      } finally g.dispose()
    }

    private def colorOf(seed: Long): Int =
      ((seed * 2654435761L) & 0xFFFFFFL).toInt

    def png(w: Int, h: Int, seed: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      fill(img, colorOf(seed))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Animated GIF via the JDK's GIF writer sequence API — the web-corpus
      * multi-frame format. Frames carry default metadata (a
      * GraphicControlExtension is optional per the GIF89a spec); the reader
      * still counts and decodes every frame.
      */
    def gif(w: Int, h: Int, nFrames: Int, seed: Long): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val writer =
        javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var i = 0
        while (i < nFrames) {
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          fill(img, colorOf(seed * 31L + i))
          writer.writeToSequence(
            new javax.imageio.IIOImage(img, null, null), null)
          i += 1
        }
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }

    /** Multi-page TIFF — the other JDK-writable multi-image container,
      * standing in for video keyframe stacks.
      */
    def tiff(w: Int, h: Int, nFrames: Int, seed: Long): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val writer =
        javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var i = 0
        while (i < nFrames) {
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          fill(img, colorOf(seed * 31L + i))
          writer.writeToSequence(
            new javax.imageio.IIOImage(img, null, null), null)
          i += 1
        }
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }

    /** Canonical 44-byte-header mono 16-bit PCM WAV of a sine wave at
      * `freqHz`, amplitude 0.5. The header is written BY HAND (not
      * `AudioSystem.write`) so `byte_len = 44 + 2·n` is exact for the
      * oracle; sample `i` quantizes as
      * `floor(0.5·32767·sin(2π·f·i/rate) + 0.5)` — the formula the SQL
      * mirror replays literally.
      */
    def wav(rateHz: Int, ms: Int, freqHz: Int): Array[Byte] = {
      val n = rateHz * ms / 1000
      val buf = java.nio.ByteBuffer.allocate(44 + 2 * n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(rateHz).putInt(rateHz * 2).putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(2 * n)
      var i = 0
      while (i < n) {
        val x = 0.5 * 32767.0 *
          math.sin(2.0 * math.Pi * freqHz * i / rateHz)
        buf.putShort(math.floor(x + 0.5).toShort)
        i += 1
      }
      buf.array()
    }
  }

  /** Real-PNG media fixture: one `(len % 96 + 32) × (doc_id % 64 + 24)`
    * PNG per document (`len` = UTF-8 byte length of `text`) — the geometry
    * formula the resize oracle mirrors in SQL.
    */
  def syntheticImageMedia(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"),
        octet_length(encode(coalesce(col("text"), lit("")), "UTF-8"))
          .cast("long").as("len"))
      // the fixture parquet reads as 1-2 partitions — spread the
      // encode-heavy synthesis across the cluster (row-deterministic, so
      // partitioning never changes the output)
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, len) =>
        MediaRow(id, Synthetic.png((len % 96 + 32).toInt,
          (id % 64 + 24).toInt, id), "img/png")
      }).toDF()
  }

  /** Real multi-frame media fixture: one `(len % 48 + 16) × (doc_id % 32
    * + 16)` TIFF with `doc_id % 4 + 2` pages per document — the frame
    * oracle's SQL-predictable geometry.
    */
  def syntheticMultiFrameMedia(spark: SparkSession,
                               docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"),
        octet_length(encode(coalesce(col("text"), lit("")), "UTF-8"))
          .cast("long").as("len"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, len) =>
        MediaRow(id, Synthetic.tiff((len % 48 + 16).toInt,
          (id % 32 + 16).toInt, (id % 4 + 2).toInt, id), "img/tiff")
      }).toDF()
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

  /** Real decoded-audio row: header facts plus two genuine DSP features
    * computed from the decoded PCM waveform (not the header) — RMS energy
    * and peak amplitude, both over samples normalized to [-1, 1).
    */
  case class AudioRow(doc_id: Long, byte_len: Long, sample_rate: Long,
                      channels: Long, n_samples: Long, duration_ms: Long,
                      rms: Double, peak: Double)

  /** REAL audio decode via the JDK's `javax.sound.sampled` — the audio
    * twin of [[ImageIoCodec]], zero new dependencies: header facts come
    * from `AudioSystem.getAudioInputStream`'s parsed format and the
    * samples are the actual 16-bit PCM frames (little-endian per the WAV
    * spec), normalized by 1/32768. Hostile/undecodable payloads return
    * None (never throw) — the same totality contract as the image codec.
    */
  object AudioCodec {
    def decode(payload: Array[Byte])
        : Option[(Long, Long, Array[Double])] = {
      if (payload == null || payload.length < 44) return None
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = in.getFormat
          if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) None
          else {
            val bytes = in.readAllBytes()
            val n = bytes.length / (2 * fmt.getChannels)
            // first channel only: the mono feature contract
            val out = new Array[Double](n)
            val stride = 2 * fmt.getChannels
            var i = 0
            while (i < n) {
              val lo = bytes(i * stride) & 0xFF
              val hi = bytes(i * stride + 1).toInt
              out(i) = ((hi << 8) | lo).toShort / 32768.0
              i += 1
            }
            Some((fmt.getSampleRate.toLong, fmt.getChannels.toLong, out))
          }
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** Synthetic-but-REAL audio fixture: one mono 16-bit PCM WAV sine per
    * document, parameters closed-form in `doc_id` so the decode oracle is
    * SQL-computable — `rate = 8000·(doc_id%4+1)` (n stays integral for
    * 10 ms-multiple durations), `ms = 20 + (doc_id%5)·10`,
    * `f = 220 + (doc_id%12)·55`. Quantization is `floor(x + 0.5)`
    * EXPLICITLY (not Math.round semantics by accident) because the oracle
    * replays it as `floor(... + 0.5)`.
    */
  def syntheticAudioMedia(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions(_.map { id =>
        MediaRow(id, Synthetic.wav(
          rateHz = (8000 * (id % 4 + 1)).toInt,
          ms = (20 + (id % 5) * 10).toInt,
          freqHz = (220 + (id % 12) * 55).toInt), "aud/wav")
      }).toDF()
  }

  /** Batch audio decode + waveform features: typed mapPartitions, the
    * same streaming-batch plumbing as [[decodeBatches]]. Undecodable
    * payloads are DROPPED (flatMap) — callers wanting a row per input
    * anti-join against the source.
    */
  def audioStats(spark: SparkSession, media: DataFrame): Dataset[AudioRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        AudioCodec.decode(r.payload).map { case (rate, ch, v) =>
          var ss = 0.0
          var peak = 0.0
          var i = 0
          while (i < v.length) {
            ss += v(i) * v(i)
            val a = math.abs(v(i))
            if (a > peak) peak = a
            i += 1
          }
          val rms = if (v.isEmpty) 0.0 else math.sqrt(ss / v.length)
          AudioRow(r.doc_id, r.payload.length.toLong, rate, ch,
            v.length.toLong, if (rate == 0) 0L else v.length * 1000L / rate,
            rms, peak)
        }
      }
    }
  }
}
