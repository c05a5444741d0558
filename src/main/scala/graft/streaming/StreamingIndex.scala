package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.ext.Similarity

/** Streaming ANN index maintenance: embedding rows land continuously
  * (the 100 TB-corpus shape — an embedding service emits vectors as
  * documents arrive, and the retrieval index must absorb them without a
  * nightly rebuild) and the coarse-cell assignment runs as a Structured
  * Streaming flow.
  *
  * The quantizer-free hyperplane LSH path ([[Similarity.hyperplaneBucket]],
  * the codegen'd `SignBits` over integer-hash planes) is the RIGHT cell
  * assigner for streaming ingest: it needs no learned state — no Lloyd
  * codebook to train, broadcast, or refresh — so the assignment is a
  * stateless per-row projection, identical in batch and stream, and the
  * cell of a vector never changes as the corpus grows. (A learned-cell
  * index would re-assign on every codebook refresh — that is a batch
  * re-index by construction, not a streaming op.)
  *
  * Downstream, the accumulated `(id, cell, vec)` parquet index serves
  * [[Similarity.bucketedNN]] directly — the same guarded within-cell
  * join the batch `annTopKHyperplane` facade path runs — so a query
  * sees every vector the stream has committed, exactly once (file-source
  * checkpointed listing; no watermark because there is no state).
  */
object StreamingIndex {

  /** Parquet stream over `dir` (new files only, checkpoint-tracked).
    * Streaming sources require an explicit schema; pass the embedding
    * table's fixed schema (streaming twin of `Tables.embeddings`).
    */
  def readEmbeddingStream(spark: SparkSession, dir: String,
                          schema: StructType,
                          maxFilesPerTrigger: Int = 64): DataFrame =
    spark.readStream.format("parquet")
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir)

  /** The stateless cell-assignment pass: one codegen'd projection, no
    * shuffle, no state. Identical semantics in batch and stream — the
    * equivalence the spec asserts.
    */
  def assignCells(emb: DataFrame, vecCol: String, dim: Int,
                  nPlanes: Int = 8): DataFrame =
    emb.withColumn("cell",
      Similarity.hyperplaneBucket(col(vecCol), dim, nPlanes))

  /** End-to-end: watch `inDir`, append cell-assigned rows as parquet
    * under `outDir`. Returns the started query; callers own its
    * lifecycle (`processAllAvailable`/`stop` in tests,
    * `awaitTermination` in prod).
    */
  def run(spark: SparkSession, inDir: String, outDir: String,
          checkpoint: String, schema: StructType, vecCol: String,
          dim: Int, nPlanes: Int = 8): StreamingQuery =
    assignCells(readEmbeddingStream(spark, inDir, schema), vecCol, dim,
        nPlanes)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()

  /** Query the accumulated index: the same guarded within-cell join the
    * batch hyperplane path runs, over everything the stream committed.
    */
  def topK(spark: SparkSession, indexDir: String, idCol: String,
           vecCol: String, k: Int, maxBucket: Int = 4096): DataFrame =
    Similarity.bucketedNN(spark.read.parquet(indexDir), idCol, vecCol,
      "cell", k = k, maxBucket = maxBucket)
}
