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

  /** One micro-batch of the PERSISTED-index loop
    * ([[runPersistedIndexLoop]]): absorb an embedding delta into a
    * [[graft.ext.AnnIndex]] under LATEST-WINS key identity — the
    * one-layer-down streaming twin of
    * [[StreamingCorpus.runCorpusShardsRekeyed]]'s supersession, applied
    * to the retrieval index instead of the shard stream. Each batch
    * carries `(keyCol, uidCol, vecCol)` rows where `uidCol` is the NEW
    * uid of this embedding (the corpus ingest id in the coherent
    * composition — [[graft.api.Graft.KeyedCorpusShardsState]]'s
    * `superseded` scaladoc); a re-delivered key's previous live uid
    * (tracked in the batchId-versioned `indexDir/keymap` state) is
    * SUPERSEDED so its stale vector stops serving immediately, and the
    * new vector enters under the frozen geometry via
    * [[graft.ext.AnnIndex.add]].
    *
    * EXACTLY-ONCE: the keymap version's `_SUCCESS` file (the
    * committer's job-commit marker — the bare directory exists from job
    * SETUP, so a crash mid-write leaves a torn dir that must NOT read
    * as completed) is the batch's commit marker, written LAST — a
    * re-delivered batch whose marker exists skips entirely. A retry of
    * a PARTIALLY-applied batch converges: supersede is idempotent
    * (tombstone set semantics), the add step skips when every batch uid
    * is already coded (the completed-add retry, detected by the
    * bloom-prefiltered membership probe) and otherwise re-enters
    * [[graft.ext.AnnIndex.add]], whose own orphan reconciliation /
    * duplicate guard either completes the torn write or refuses loudly;
    * the torn keymap dir itself is replaced by the retry's
    * overwrite-mode write. The drift-policy rebuild (`maintainDrift`
    * > 0 → [[graft.ext.AnnIndex.maintain]] under
    * `maintainTrainFraction`) runs ONLY after the marker commits: a
    * rebuild physically purges superseded rows, so running it before
    * the marker would strand a retry whose supersede targets no longer
    * exist.
    *
    * Guards (all loud, delta-sized probes — [[requireKeyedDelta]]):
    * keys AND uids must be unique and non-null within the batch (a
    * null uid could never be retired and is invisible to the dup
    * guards; duplicate uids would break the membership probe's
    * all-or-none retry adjudication); a re-delivered key must arrive
    * under a NEW uid — re-using the previous live uid would tombstone
    * the very row the add step then refuses as a duplicate.
    */
  private[graft] def writeIndexBatch(batch: DataFrame, batchId: Long,
                                     indexDir: String, keyCol: String,
                                     uidCol: String, vecCol: String,
                                     maxAddedFraction: Double,
                                     maintainDrift: Double,
                                     maintainTrainFraction: Double = 1.0)
      : Unit = {
    val spark = batch.sparkSession
    val A = graft.ext.AnnIndex
    val keymapDir = s"$indexDir/keymap"
    // keymap versions are OFFSET BY ONE (batch B owns v=B+1): v=0 is the
    // build-time seed slot ([[seedIndexKeymap]]) — the initial corpus's
    // key→uid rows, so re-deliveries of BUILT keys supersede too, not
    // only re-deliveries of streamed ones. Every version is the complete
    // map (carry-forward below), so pruning old versions loses nothing.
    val vNum = batchId + 1
    val okPath = new org.apache.hadoop.fs.Path(
      s"$keymapDir/v=$vNum/_SUCCESS")
    val fs = okPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(okPath)) return // completed batch re-delivered: skip
    val n = requireKeyedDelta(batch, keyCol, uidCol, "graft index loop")
    // every cache below is batch-scoped: an indefinitely-running loop
    // must not grow the session cache registry by two entries per batch
    graft.ext.CacheScope.scoped {
      val delta = batch.select(col(keyCol).as("key"),
          col(uidCol).as("uid"), col(vecCol).as("vec"))
        .transform(graft.ext.CacheScope.cache)
      val prior = StreamingCorpus.latestShardState(spark, keymapDir, vNum)
      if (n > 0) {
        // the re-delivered keys' previous live uids — delta-sized via the
        // broadcast semi-join against the batch's keys
        val old = prior.map(_.join(broadcast(delta.select(col("key"))),
            Seq("key")).transform(graft.ext.CacheScope.cache))
        old.foreach { o =>
          require(o.join(delta.select(col("key"), col("uid")),
              Seq("key", "uid"), "left_semi").isEmpty,
            "graft index loop: a re-delivered key re-uses its previous " +
              "live uid — a re-embedded key must enter under a NEW uid " +
              "(the corpus ingest-id contract); superseding the old uid " +
              "would tombstone the very row the add step then refuses " +
              "as a duplicate")
          if (!o.isEmpty)
            A.supersede(spark, indexDir, o.select(col("uid")), "uid")
        }
        // add, retry-convergent: all-coded = completed re-delivery
        // (skip); none = fresh delta; a strict subset re-enters add(),
        // whose dup guard adjudicates the torn state loudly
        val known = A.knownUidCount(spark, indexDir,
          delta.select(col("uid")), "uid")
        if (known < n)
          A.add(spark, indexDir,
            delta.select(col("uid").as(uidCol), col("vec").as(vecCol)),
            uidCol, vecCol, maxAddedFraction)
      }
      // keymap: carry forward unaffected keys, replace re-delivered
      // ones; the overwrite to v=<B+1> (its _SUCCESS specifically) is
      // the batch's commit marker
      val carried = prior.map(_.join(broadcast(delta.select(col("key"))),
          Seq("key"), "left_anti"))
        .getOrElse(delta.select(col("key"), col("uid")).limit(0))
      carried.unionByName(delta.select(col("key"), col("uid")))
        .write.mode("overwrite").parquet(s"$keymapDir/v=$vNum")
    }
    StreamingCorpus.pruneVersions(spark, keymapDir)
    if (maintainDrift > 0)
      A.maintain(spark, indexDir, maintainDrift,
        trainFraction = maintainTrainFraction)
  }

  /** The index loop's batch-contract probes, shared by
    * [[writeIndexBatch]] and [[seedIndexKeymap]] — two delta-sized jobs
    * (the corpus loop's kProbe shape), returning the row count so
    * callers never pay a third: keys unique + non-null (two embeddings
    * per key would race the latest-wins keymap), uids unique + non-null
    * (a null uid can never be retired — supersede refuses nulls — and
    * is invisible to the bloom/dup guards; a duplicate uid breaks the
    * membership probe's all-or-none retry adjudication).
    */
  private def requireKeyedDelta(df: DataFrame, keyCol: String,
                                uidCol: String, who: String): Long = {
    val kProbe = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__c"))
      .agg(max(col("__c")).as("__mx"),
        max(when(col(keyCol).isNull, 1).otherwise(0)).as("__nn"))
      .head()
    require(kProbe.isNullAt(1) || kProbe.getInt(1) == 0,
      s"$who: $keyCol carries NULLs — a null key has no identity to " +
        "supersede under; drop or repair those rows first")
    require(kProbe.isNullAt(0) || kProbe.getLong(0) <= 1L,
      s"$who: $keyCol is not unique within the batch — two embeddings " +
        "per key would race the latest-wins keymap; dedup the batch by " +
        "key first")
    val uProbe = df.agg(count(lit(1)).as("__n"),
      count(col(uidCol)).as("__nu"),
      countDistinct(col(uidCol)).as("__nd")).head()
    val n = uProbe.getLong(0)
    require(uProbe.getLong(1) == n,
      s"$who: $uidCol carries NULLs — a null uid can never be retired " +
        "(supersede refuses nulls) and is invisible to the index's " +
        "duplicate guards; assign real uids first")
    require(uProbe.getLong(2) == n,
      s"$who: $uidCol is not unique within the batch — the retry " +
        "convergence probe adjudicates all-or-none by uid count; dedup " +
        "the batch by uid first")
    n
  }

  /** Seed the loop's keymap with the BUILD-TIME corpus's key→uid rows
    * (the `v=0` slot — batch versions start at v=1): without it the
    * loop can only supersede keys it streamed itself, and a re-crawl of
    * a built document would leave the built vector serving forever.
    * Call once, between [[graft.ext.AnnIndex.build]] and
    * [[runPersistedIndexLoop]]; refuses if a COMMITTED keymap version
    * already exists (seeding a live loop would race its batch
    * versioning), while a torn v=0 from a crashed seed (directory
    * without its `_SUCCESS`) is simply replaced. The seed obeys the
    * same key/uid contract as every batch ([[requireKeyedDelta]]) —
    * a key with two uids would make its first re-delivery retire a
    * still-live second document.
    */
  def seedIndexKeymap(spark: SparkSession, indexDir: String,
                      keys: DataFrame, keyCol: String,
                      uidCol: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/keymap")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val committed = fs.listStatus(p).exists(st =>
        st.getPath.getName.startsWith("v=") &&
          fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      require(!committed,
        s"seedIndexKeymap: $indexDir/keymap already holds a committed " +
          "version — the seed is the PRE-LOOP slot; seeding a live loop " +
          "would race its batch versioning. Start a new indexDir, or " +
          "let the loop carry on")
    }
    requireKeyedDelta(keys.select(col(keyCol), col(uidCol)), keyCol,
      uidCol, "seedIndexKeymap")
    keys.select(col(keyCol).as("key"), col(uidCol).as("uid"))
      .write.mode("overwrite").parquet(s"$indexDir/keymap/v=0")
  }

  /** Apply the REKEYED CORPUS LOOP'S published supersession feed to a
    * persisted index — the consumer end of the corpus→index wire
    * ([[StreamingCorpus.runCorpusShardsRekeyed]] publishes every
    * micro-batch's retired ingest ids under
    * `corpusOutDir/superseded/batch_id=B`;
    * [[graft.api.Graft.KeyedCorpusShardsState]]'s `superseded` scaladoc
    * is the batch-side twin). One call retires every corpus-superseded
    * uid the index CURRENTLY SERVES, so stale vectors stop ranking even
    * before the documents' re-embeddings arrive through the index loop.
    *
    * The feed may name ids the index never held (documents without
    * embeddings, ids already purged by a rebuild) — those are skipped
    * by a membership semi-join rather than tripping
    * [[graft.ext.AnnIndex.supersede]]'s exists guard: the feed's
    * contract is "retired from the corpus", not "present in this
    * index", so absence here is normal, not an error. IDEMPOTENT by
    * supersede's tombstone set semantics — re-applying the whole feed
    * (or overlapping applications on a cron) converges; no watermark
    * state to manage. Returns (feed ids seen, uids newly eligible and
    * tombstoned). Takes the index writer lock via supersede; do not
    * run concurrently with the index loop's own batches (single-writer
    * rule — schedule it between batches, or let the loop's keymap
    * handle keys it streams itself).
    */
  def applySupersessionFeed(spark: SparkSession, corpusOutDir: String,
                            indexDir: String,
                            idCol: String = "ingest_id"): (Long, Long) = {
    val A = graft.ext.AnnIndex
    val feedPath = new org.apache.hadoop.fs.Path(s"$corpusOutDir/superseded")
    val fs = feedPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // no feed, a feed of only torn/empty batch dirs (a crash mid-publish
    // leaves batch_id=B holding only _temporary; an all-dropped batch
    // can publish zero part files): all the same clean no-op — reading
    // a part-file-less tree would die on schema inference instead
    val hasData = fs.exists(feedPath) && fs.listStatus(feedPath).exists {
      d =>
        d.isDirectory && d.getPath.getName.startsWith("batch_id=") &&
          fs.listStatus(d.getPath).exists(st =>
            st.getPath.getName.startsWith("part-") && st.getLen > 0)
    }
    if (!hasData) return (0L, 0L)
    val root = A.currentRoot(spark, indexDir)
    // a feed pointed at an unbuilt (or typo'd) index must be LOUD — a
    // raw path-not-found on codes/ names neither the problem nor the fix
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$root/params")),
      s"applySupersessionFeed: $indexDir holds no built index (no " +
        "params artifact) — build it (AnnIndex.build) before applying " +
        "the corpus feed, or check the indexDir path")
    graft.ext.CacheScope.scoped {
      val feed = spark.read.parquet(s"$corpusOutDir/superseded")
        .select(col(idCol).as("uid")).distinct()
        .transform(graft.ext.CacheScope.cache)
      val nFeed = feed.count()
      if (nFeed == 0) (0L, 0L)
      else {
        // restrict to uids the index actually serves: present in codes
        // (ONE codes uid-column scan — the apply-cadence cost; the
        // supersede below is the pre-verified fast path, so codes is
        // not scanned a second time) and not already tombstoned
        val present = spark.read.parquet(s"$root/codes")
          .select(col("uid"))
          .join(feed, Seq("uid"), "left_semi")
        val toRetire = (A.readTombstones(spark, root) match {
          case Some(tomb) => present.join(tomb, Seq("uid"), "left_anti")
          case None => present
        }).transform(graft.ext.CacheScope.cache)
        val n = toRetire.count()
        if (n > 0) A.supersedeVerified(spark, indexDir, toRetire)
        (nFeed, n)
      }
    }
  }

  /** End-to-end STREAMING maintenance of a persisted
    * [[graft.ext.AnnIndex]] — watch `inDir` for embedding deltas and
    * absorb each micro-batch via [[writeIndexBatch]]: supersede
    * re-delivered keys' stale vectors, add the new ones under the
    * frozen geometry, and (optionally) rebuild when measured drift
    * crosses `maintainDrift` — the retrieval tier of the continuous
    * corpus loop, kept coherent without a nightly full re-index. The
    * policy rebuild runs INSIDE the triggering micro-batch (the
    * single-writer rule leaves it nowhere else safe), stalling the
    * stream for the rebuild's duration — `maintainTrainFraction`
    * subsamples its Lloyd training (the IndexScale probes run 0.1) to
    * bound that stall at scale.
    * Searches serve concurrently throughout ([[graft.ext.AnnIndex.search]]
    * takes no lock; it resolves the newest committed version per call).
    *
    * The index must already exist (built once from the initial corpus —
    * [[graft.ext.AnnIndex.build]]); the loop maintains it. Seed the
    * keymap with the built keys first ([[seedIndexKeymap]]) so
    * re-crawls of BUILT documents supersede too. Single
    * producer per `indexDir`, ENFORCED via the `_OWNER` checkpoint-
    * identity lock ([[StreamingCorpus.acquireProducerLock]]): the
    * keymap's batchId versioning — and add/supersede retry convergence
    * — are single-writer by construction (a manual rebuild between a
    * crashed batch and its retry would purge the supersede targets the
    * retry expects; the ownership rule makes that a deliberate
    * takeover, not an accident).
    */
  def runPersistedIndexLoop(spark: SparkSession, inDir: String,
                            indexDir: String, checkpoint: String,
                            schema: StructType, keyCol: String,
                            uidCol: String, vecCol: String,
                            maxAddedFraction: Double = 2.0,
                            maintainDrift: Double = 0.0,
                            maintainTrainFraction: Double = 1.0,
                            maxFilesPerTrigger: Int = 64): StreamingQuery = {
    StreamingCorpus.acquireProducerLock(spark, indexDir, checkpoint)
    readEmbeddingStream(spark, inDir, schema, maxFilesPerTrigger)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeIndexBatch(batch, batchId, indexDir, keyCol, uidCol, vecCol,
          maxAddedFraction, maintainDrift, maintainTrainFraction)
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
