package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Multimodal

/** Streaming multimodal ingest: media files land continuously (the
  * 100 TB-corpus shape — crawlers and uploads never stop) and the
  * metadata pass runs as a Structured Streaming flow instead of a
  * batch job.
  *
  * The pipeline is the batch one verbatim — `binaryFile` source →
  * [[Multimodal.asMediaFromFiles]] bridge → [[Multimodal.decodeBatches]]
  * (header-only decode, stateless typed `mapPartitions`) — which is the
  * point: every stage is stateless row-local compute, so the SAME code
  * serves batch backfill and streaming tail with no dual maintenance.
  * File-source bookkeeping (`maxFilesPerTrigger`, checkpointed listing)
  * gives exactly-once per file; there is no watermark because there is
  * no state.
  */
object StreamingMedia {

  /** `binaryFile` stream over `dir` (new files only, checkpoint-tracked).
    * `pathGlobFilter` prunes at LISTING time — non-matching files are
    * never opened, the streaming twin of partition pruning.
    */
  /** The `binaryFile` source's FIXED schema (streaming sources require an
    * explicit schema; binaryFile's is format-defined, not data-inferred).
    */
  val BinaryFileSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
  }

  def readMediaStream(spark: SparkSession, dir: String,
                      glob: String = "*",
                      maxFilesPerTrigger: Int = 1024): DataFrame =
    spark.readStream.format("binaryFile")
      .schema(BinaryFileSchema)
      .option("pathGlobFilter", glob)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir)

  /** The streaming metadata pass: files → media shape → typed header
    * decode. Output schema matches the batch [[Multimodal.decodeBatches]]
    * exactly (plus the source path for lineage).
    */
  def decodedMetadata(spark: SparkSession, files: DataFrame): DataFrame = {
    val media = Multimodal.asMediaFromFiles(files)
    Multimodal.decodeBatches(spark, media).toDF()
  }

  /** End-to-end: watch `inDir`, append decoded metadata as parquet under
    * `outDir`. Returns the started query; callers own its lifecycle
    * (`processAllAvailable`/`stop` in tests, `awaitTermination` in prod).
    */
  def run(spark: SparkSession, inDir: String, outDir: String,
          checkpoint: String, glob: String = "*")
      : org.apache.spark.sql.streaming.StreamingQuery =
    decodedMetadata(spark, readMediaStream(spark, inDir, glob))
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()
}
