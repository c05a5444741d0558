package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.ext.{Bpe, NbClassifier, TextAnalysis}

/** Streaming corpus-quality gating: documents land continuously (the
  * crawl-ingest shape — a fetcher emits pages as they arrive, and the
  * training corpus must absorb the survivors without a nightly batch
  * re-filter) and BOTH quality gates run as stateless per-row
  * projections, so the flow needs no watermark and no state store:
  *
  *  - the Gopher rule battery via
  *    [[TextAnalysis.withGopherRulesLocal]] (the row-local fold twin of
  *    the batch operator — same predicates, same 6dp-guarded
  *    comparisons, spec-pinned value-identical on the fixture and
  *    sharing `q_gopher_rules`' oracle through `q_gopher_local`);
  *  - the trained-NB quality model via [[NbClassifier.scoreLocal]]
  *    under a serve-time [[NbClassifier.NbModel]] — the
  *    train-batch/serve-stream split: the model is fit OFFLINE on the
  *    curated corpus ([[NbClassifier.train]], vocab-bounded weights
  *    collected once, the ANN-codebook allowance) and rides the stream
  *    as a broadcast map literal.
  *
  * This is the serve-time twin of the batch `corpusBuild` recipe's
  * first two gates; the corpus-relative stages (dedup, temperature
  * mixture, packing) are inherently cross-document and stay batch —
  * the standard lambda-architecture cut for corpus production.
  */
object StreamingCorpus {

  /** Parquet stream over a documents directory (new files only,
    * checkpoint-tracked). Streaming sources require an explicit schema.
    */
  def readDocStream(spark: SparkSession, dir: String, schema: StructType,
                    maxFilesPerTrigger: Int = 64): DataFrame =
    spark.readStream.format("parquet")
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir)

  /** The composed stateless gate: Gopher keep → NB positive margin.
    * Every input column rides through; `n_tokens`, `margin`, and `pred`
    * are appended (rule booleans are consumed by the filter — survivors
    * have them all true by construction). Identical semantics on a
    * batch frame (the parity the spec asserts); per micro-batch it is
    * one projection chain — zero shuffle, zero state.
    */
  def qualityGate(docs: DataFrame, textCol: String, idCol: String,
                  model: NbClassifier.NbModel,
                  minTokens: Long = 50,
                  maxTokens: Long = 100000): DataFrame = {
    val keptCols = docs.columns
    val gated = TextAnalysis
      .withGopherRulesLocal(docs, textCol, minTokens, maxTokens)
      .filter(col("keep"))
      .select(keptCols.map(col): _*)
    NbClassifier.scoreLocal(gated, textCol, model)
      .filter(col("pred"))
  }

  /** End-to-end: watch `inDir`, append gated survivors as parquet under
    * `outDir`. Returns the started query; callers own its lifecycle.
    */
  def run(spark: SparkSession, inDir: String, outDir: String,
          checkpoint: String, schema: StructType, textCol: String,
          idCol: String, model: NbClassifier.NbModel,
          minTokens: Long = 50,
          maxTokens: Long = 100000): StreamingQuery =
    qualityGate(readDocStream(spark, inDir, schema), textCol, idCol,
        model, minTokens, maxTokens)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()

  /** End-to-end token-id SERVING: watch `inDir`, gate each micro-batch
    * through the stateless quality gate, and append the gated survivors'
    * dense token-id sequences ([[Bpe.encodeIdsWith]] under the
    * pre-trained `dict`) as parquet under `outDir` — the export a
    * continuously-ingesting training pipeline actually ships.
    *
    * Scale/state shape: the per-doc sequence aggregate is keyed by
    * `idCol` WITHIN the micro-batch (a document's words arrive in one
    * file, so no cross-batch state is needed — the reason this is a
    * `foreachBatch` aggregation, not a stateful operator), the
    * dictionary and vocabulary join broadcast-side, and the
    * vocabulary's driver-side id assignment runs ONCE at query start,
    * not per batch. Sink semantics are the standard foreachBatch
    * contract: append-mode parquet, at-least-once on micro-batch retry
    * (the source checkpoint dedups input files; a retried WRITE of the
    * same batch can duplicate output rows — idempotent consumers or a
    * downstream exact-dedup pass own that, as with every foreachBatch
    * parquet sink).
    */
  def runEncodeIds(spark: SparkSession, inDir: String, outDir: String,
                   checkpoint: String, schema: StructType,
                   textCol: String, idCol: String,
                   model: NbClassifier.NbModel, dict: DataFrame,
                   minTokens: Long = 50,
                   maxTokens: Long = 100000): StreamingQuery = {
    val vocab = Bpe.vocabIds(dict)
    qualityGate(readDocStream(spark, inDir, schema), textCol, idCol,
        model, minTokens, maxTokens)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Bpe.encodeIdsWith(batch, textCol, idCol, dict, vocab)
          .write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
