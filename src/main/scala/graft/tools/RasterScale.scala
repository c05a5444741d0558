package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Multimodal

/** Dev tool: raster-stage throughput at scale — the SCALING.md evidence
  * that the round-10 real resize / frame-extraction path holds its per-
  * image cost as the corpus grows (the work is embarrassingly parallel
  * row-local compute; the only scale risk is per-image constant cost).
  *
  *   RasterScale [nImages]
  *
  * Synthesizes `n` real PNGs (and `n/4` multi-page TIFFs) on the
  * executors with the same geometry formulas as the oracled queries,
  * CACHES the media frames so the timed passes isolate the raster
  * stages, then times header-only decode, full resize (decode →
  * Graphics2D resample → PNG encode → header verify), and frame
  * extraction, cold and warm. Reports wall + µs/image.
  */
object RasterScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val pngMedia = spark.range(n)
      .select(col("id").as("doc_id"), (col("id") % 977L).as("len"))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, len) =>
        Multimodal.MediaRow(id, Multimodal.Synthetic.png(
          (len % 96 + 32).toInt, (id % 64 + 24).toInt, id), "img/png")
      }).toDF().cache()
    val nPng = pngMedia.count()
    val tiffMedia = spark.range(n / 4)
      .select(col("id").as("doc_id"), (col("id") % 977L).as("len"))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, len) =>
        Multimodal.MediaRow(id, Multimodal.Synthetic.tiff(
          (len % 48 + 16).toInt, (id % 32 + 16).toInt,
          (id % 4 + 2).toInt, id), "img/tiff")
      }).toDF().cache()
    val nTiff = tiffMedia.count()
    println(s"[rasterscale] media cached: $nPng PNGs, $nTiff TIFFs")

    def timed(label: String, count: Long)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[rasterscale] $label%-14s wall=$wall%6.2f s  " +
        f"${wall * 1e6 / count}%7.1f us/image  ($rows rows)")
    }

    for (pass <- Seq("cold", "warm")) {
      println(s"[rasterscale] --- $pass ---")
      timed("decode_meta", nPng) {
        Multimodal.decodeBatches(spark, pngMedia).count()
      }
      timed("resize", nPng) {
        Multimodal.resizeMedia(spark, pngMedia, 64, 48).count()
      }
      timed("frame_extract", nTiff) {
        Multimodal.frameExtract(spark, tiffMedia, everyK = 2).count()
      }
    }
    spark.stop()
  }
}
