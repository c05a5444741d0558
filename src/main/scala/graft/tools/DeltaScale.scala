package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.Graft
import graft.ext.{Bpe, NbClassifier, Sampling, TextAnalysis => TA}

/** Dev tool: measure the INCREMENTAL corpus build
  * ([[Graft.corpusBuildDelta]]) against the full frozen-artifact rebuild
  * it replaces — the SCALING.md evidence that absorbing a crawl delta
  * costs delta-sized work, not corpus-sized work. The state round-trips
  * PARQUET between the history pass and the delta pass (keepers +
  * offsets written and re-read), because that is the production
  * contract: the nightly job boots from disk state, not a live lineage.
  *
  * Also re-proves the equivalence contract at scale: the history+delta
  * pack summaries must equal the one-shot batch pass over the union,
  * row for row.
  *
  *   DeltaScale [documentsDir] [deltaFraction‰]
  */
object DeltaScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf0.1x100")
    val deltaPerMille = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.io.Tables.documents(spark, dir)
    if (args.lift(2).contains("compact")) { compactProbe(spark, docs); return }
    if (args.lift(2).contains("statecompact")) { stateCompactProbe(spark, docs); return }
    if (args.lift(2).contains("statesegments")) { stateSegmentsProbe(spark, docs); return }
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val n = docs.count()
    val splitId = maxId - maxId * deltaPerMille / 1000
    val history = docs.filter(col("doc_id") < splitId)
    val delta = docs.filter(col("doc_id") >= splitId)
    println(s"[deltascale] $n docs from $dir; history < $splitId, " +
      s"delta = ${delta.count()} docs (${deltaPerMille}‰)")

    // frozen artifacts, trained on HISTORY (the realistic posture: the
    // model/tokenizer predate the delta)
    val labeled = TA.withTokenStats(history, "text")
      .withColumn("label_weak",
        round(TA.qualityScore(col("n_tokens"), col("token_chars"),
          col("n_punct"), col("n_stopwords")) + lit(1e-9), 4) >= 0.5)
      .select(col("doc_id"), col("text"), col("label_weak"))
    val model = NbClassifier.train(
      labeled.filter(Sampling.hashBucket(col("doc_id"), "graft") < 80),
      "text", "doc_id", "label_weak")
    val (_, dict0) = Bpe.train(history, "text", 8)
    val dict = dict0.cache(); dict.count()
    println("[deltascale] frozen artifacts ready (NB model + 8-merge dict)")

    val base = java.nio.file.Files
      .createTempDirectory("graft-deltascale").toString
    def timed[A](label: String)(f: => A): A = {
      spark.catalog.clearCache(); dict.cache().count(); System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"[deltascale] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    // summaries land in parquet (small frames) so the parity diff at the
    // end reads artifacts instead of replaying the whole lineage
    def summarize(p: DataFrame, name: String): DataFrame = {
      graft.ext.Packing.packSummary(
          p.select(col("lang"), col("doc_id"), col("n_tokens"),
            col("pack_id")),
          Seq("lang"), "doc_id", "n_tokens")
        .write.parquet(s"$base/$name")
      spark.read.parquet(s"$base/$name")
    }

    // the cost being replaced: one frozen-artifact batch pass over union
    val pAllS = timed(s"full rebuild over $n docs") {
      val (pAll, _) = Graft.corpusBuildDelta(docs, "text", "doc_id",
        "lang", model, dict, state = None, minTokens = 10)
      summarize(pAll, "all")
    }
    // history pass (run once when the pipeline is bootstrapped)
    val p1s = timed("history pass + state persist") {
      val (p1, st1) = Graft.corpusBuildDelta(history, "text", "doc_id",
        "lang", model, dict, state = None, minTokens = 10)
      Graft.corpusStateSave(st1, s"$base/cstate")
      summarize(p1, "p1")
    }
    // the nightly cost: absorb the delta from DISK state
    val p2s = timed(s"absorb ${deltaPerMille}‰ delta from disk state") {
      val st = Graft.corpusStateLoad(spark, s"$base/cstate")
      val (p2, _) = Graft.corpusBuildDelta(delta, "text", "doc_id",
        "lang", model, dict, state = Some(st), minTokens = 10)
      summarize(p2, "p2")
    }
    // r15: the same absorb from a BUCKETED keeper state — the history
    // side of the dedup anti-join reads pre-partitioned/sorted on
    // content_hash, so only the delta shuffles (PhysicalSpec pins the
    // plan; this prints the measured shuffle-byte cut). Broadcast is
    // DISABLED for this comparison pair: at probe scale the digest
    // history still fits a broadcast (which hides the exchange the
    // layout eliminates), while at 100 TB it never does — forcing the
    // distributed join is the honest at-scale shape.
    timed("re-save state BUCKETED (bucketBy=32)") {
      Graft.corpusStateSave(Graft.corpusStateLoad(spark, s"$base/cstate"),
        s"$base/cstateb", bucketBy = 32)
    }
    // plan-shape evidence, not listener bytes (stage-metric attribution
    // is too coarse for one join inside a ~60-job absorb): count the
    // Exchanges that repartition the HISTORY digest column — the plain
    // layout pays one per anti-join instance, the bucketed layout zero
    // (its scan is already hash-distributed on content_hash; the plan
    // also shows `Bucketed: true … SelectedBucketsCount`)
    def historyExchanges(df: DataFrame): Int =
      df.queryExecution.executedPlan.toString.linesIterator
        .count(_.contains("Exchange hashpartitioning(content_hash"))
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      timed(s"absorb ${deltaPerMille}‰ delta, plain state, no broadcast") {
        val st = Graft.corpusStateLoad(spark, s"$base/cstate")
        val (p2, _) = Graft.corpusBuildDelta(delta, "text", "doc_id",
          "lang", model, dict, state = Some(st), minTokens = 10)
        val out = summarize(p2, "p2nb")
        println(s"[deltascale] plain-state history-side exchanges: " +
          historyExchanges(p2))
        out
      }
      timed(s"absorb ${deltaPerMille}‰ delta from BUCKETED disk state") {
        val st = Graft.corpusStateLoad(spark, s"$base/cstateb")
        val (p2, _) = Graft.corpusBuildDelta(delta, "text", "doc_id",
          "lang", model, dict, state = Some(st), minTokens = 10)
        val out = summarize(p2, "p2b")
        println(s"[deltascale] bucketed-state history-side exchanges: " +
          historyExchanges(p2))
        out
      }
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    val bothAbsorbs = spark.read.parquet(s"$base/p2")
      .exceptAll(spark.read.parquet(s"$base/p2b")).count() +
      spark.read.parquet(s"$base/p2b")
        .exceptAll(spark.read.parquet(s"$base/p2")).count() +
      spark.read.parquet(s"$base/p2nb")
        .exceptAll(spark.read.parquet(s"$base/p2")).count()
    println(s"[deltascale] bucketed absorb == plain absorb: " +
      (if (bothAbsorbs == 0) "EXACT MATCH" else s"DIVERGED ($bothAbsorbs)"))
    // equivalence at scale: history+delta == one-shot union, exactly.
    // The boundary pack appears in both delta summaries — merge by key.
    val merged = p1s.unionByName(p2s)
      .groupBy(col("lang"), col("pack_id"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("pack_tokens")).as("pack_tokens"),
        min(col("first_doc")).as("first_doc"),
        max(col("last_doc")).as("last_doc"))
    val diff = merged.exceptAll(pAllS).count() +
      pAllS.exceptAll(merged).count()
    println(s"[deltascale] incremental == one-shot: " +
      (if (diff == 0) "EXACT MATCH" else s"DIVERGED ($diff rows)"))

    // optional third arg "shards": the FULL loop (gate→dedup→encode→
    // incremental shard writer) measured the same way — absorb cost vs
    // full shard rebuild, state (keepers + shard tails) via parquet
    var shardDiff = 0L
    if (args.lift(2).contains("shards")) {
      val tok = Bpe.Tokenizer(Nil, dict, Bpe.vocabIds(dict))
      def fp(df: DataFrame, name: String): DataFrame = {
        df.select(col("lang"), col("shard_id"), col("n_tokens"),
            md5(array_join(transform(col("token_ids"),
              i => i.cast("string")), ",")).as("ids"))
          .write.parquet(s"$base/$name")
        spark.read.parquet(s"$base/$name")
      }
      val sAllF = timed(s"full shard rebuild over $n docs") {
        val (sAll, stAll) = Graft.corpusShardsDelta(docs, "text",
          "doc_id", "lang", model, tok, state = None, minTokens = 10)
        fp(sAll.unionByName(
          Graft.tokenShardsFlush(stAll.shards, Seq("lang"), 256)), "sall")
      }
      val s1F = timed("shard history pass + state persist") {
        val (s1, st1) = Graft.corpusShardsDelta(history, "text", "doc_id",
          "lang", model, tok, state = None, minTokens = 10)
        Graft.corpusShardsStateSave(st1, s"$base/sstate")
        fp(s1, "s1")
      }
      val s2F = timed(s"shard-absorb ${deltaPerMille}‰ delta from disk") {
        val st = Graft.corpusShardsStateLoad(spark, s"$base/sstate")
        val (s2, st2) = Graft.corpusShardsDelta(delta, "text", "doc_id",
          "lang", model, tok, state = Some(st), minTokens = 10)
        fp(s2.unionByName(
          Graft.tokenShardsFlush(st2.shards, Seq("lang"), 256)), "s2")
      }
      shardDiff = s1F.unionByName(s2F).exceptAll(sAllF).count() +
        sAllF.exceptAll(s1F.unionByName(s2F)).count()
      println(s"[deltascale] incremental shards == one-shot: " +
        (if (shardDiff == 0) "EXACT MATCH"
         else s"DIVERGED ($shardDiff rows)"))
    }
    spark.stop()
    if (diff != 0 || shardDiff != 0) sys.exit(1)
  }

  /** `statecompact` mode (third arg): the keeper-state RETENTION bound
    * at corpus scale — N rounds of re-delivering the same 1% of keys
    * with UNCHANGED content (the nightly-recrawl shape) grow the full
    * state by one dead row per re-delivery forever, while the
    * compact-after-every-round chain stays flat at (accepted + keys)
    * rows; a final CHANGED-content delta then supersedes over the
    * compacted state and must emit exactly the full chain's shards.
    *
    *   DeltaScale [documentsDir] [ignored] statecompact
    */
  private def stateCompactProbe(spark: SparkSession,
                                docs: DataFrame): Unit = {
    val uk = docs.withColumn("ukey",
        concat(lit("u-"), reverse(col("doc_id").cast("string"))))
      .drop("doc_id")
    val (r1raw, b1) = Graft.withIngestIds(uk, "ukey")
    val r1 = r1raw.localCheckpoint(true)
    val n = r1.count()
    val (merges, dict0) = Bpe.train(r1, "text", 8)
    val dict = dict0.cache(); dict.count()
    val tok = Bpe.Tokenizer(merges, dict, Bpe.vocabIds(dict))
    val P = Graft.RekeyPolicy.LatestWins
    def compact(st: Graft.KeyedCorpusShardsState) =
      Graft.corpusRekeyedStateCompact(st, "ukey", "ingest_id")
    val recrawlKeys = r1.filter(Sampling.hashBucket(col("ukey"),
      "statecompact") < 10).select(col("ukey")).localCheckpoint(true)
    println(s"[deltascale/statecompact] $n docs; " +
      s"${recrawlKeys.count()} keys re-delivered per round")
    val (s0, st0) = Graft.rekeyedCore(r1, "text", "ingest_id", "ukey",
      "lang", tok, state = None, policy = P, ctxTokens = 256,
      checkIdOrder = true)
    s0.count()
    var stFull = st0
    var stComp = compact(st0)
    var base = b1
    for (round <- 1 to 3) {
      val recrawl = r1.join(recrawlKeys, Seq("ukey"), "left_semi")
        .drop("ingest_id")
      val (rd, b) = Graft.withIngestIds(recrawl, "ukey", base = base,
        salt = s"round$round")
      base = b
      val rdc = rd.localCheckpoint(true)
      val (sF, stF) = Graft.rekeyedCore(rdc, "text", "ingest_id", "ukey",
        "lang", tok, state = Some(stFull), policy = P, ctxTokens = 256,
        checkIdOrder = true)
      sF.count(); stFull = stF
      val (sC, stC) = Graft.rekeyedCore(rdc, "text", "ingest_id", "ukey",
        "lang", tok, state = Some(stComp), policy = P, ctxTokens = 256,
        checkIdOrder = true)
      sC.count(); stComp = compact(stC)
      println(s"[deltascale/statecompact] round $round keeper rows: " +
        s"full=${stFull.keepers.count()} " +
        s"compacted=${stComp.keepers.count()}")
    }
    // a changed-content delta supersedes over the COMPACTED state and
    // must emit exactly what the full chain emits
    val changed = r1.join(recrawlKeys, Seq("ukey"), "left_semi")
      .withColumn("text", concat(col("text"), lit(" changed rev")))
      .drop("ingest_id")
    val (cd, _) = Graft.withIngestIds(changed, "ukey", base = base,
      salt = "changed")
    val cdc = cd.localCheckpoint(true)
    def fpq(df: DataFrame): DataFrame =
      df.select(col("lang"), col("shard_id"), col("n_tokens"),
        md5(array_join(transform(col("token_ids"),
          i => i.cast("string")), ",")).as("ids"))
    val (eF, _) = Graft.rekeyedCore(cdc, "text", "ingest_id", "ukey",
      "lang", tok, state = Some(stFull), policy = P, ctxTokens = 256,
      checkIdOrder = true)
    val (eC, _) = Graft.rekeyedCore(cdc, "text", "ingest_id", "ukey",
      "lang", tok, state = Some(stComp), policy = P, ctxTokens = 256,
      checkIdOrder = true)
    val d = fpq(eF).exceptAll(fpq(eC)).count() +
      fpq(eC).exceptAll(fpq(eF)).count()
    println(s"[deltascale/statecompact] changed-content absorb over " +
      "compacted state: " +
      (if (d == 0) "EXACT MATCH" else s"DIVERGED ($d rows)"))
    spark.stop()
    if (d != 0) sys.exit(1)
  }

  /** `statesegments` mode (third arg): the STREAMING keeper-state write
    * amplification at corpus scale (r17) — the loop persists delta
    * SEGMENTS + flip overrides instead of rewriting the full history
    * per batch, and folds into a compacted base on the
    * `stateCompactEveryBatches` cadence. One base batch ingests the
    * whole corpus, three nightly 10%-recrawl batches follow (changed
    * content → supersessions → flips); per batch the probe reports the
    * segment bytes actually written vs the base bytes a full-chain
    * rewrite would have paid, then folds and verifies the reconstructed
    * view row-for-row against the in-memory full chain.
    *
    *   DeltaScale [documentsDir] [ignored] statesegments
    */
  private def stateSegmentsProbe(spark: SparkSession,
                                 docs: DataFrame): Unit = {
    val S = graft.streaming.StreamingCorpus
    val uk = docs.withColumn("ukey",
        concat(lit("u-"), reverse(col("doc_id").cast("string"))))
      .drop("doc_id").localCheckpoint(true)
    val (merges, dict0) = Bpe.train(uk, "text", 8)
    val dict = dict0.cache(); dict.count()
    val tok = Bpe.Tokenizer(merges, dict, Bpe.vocabIds(dict))
    val P = Graft.RekeyPolicy.LatestWins
    val outDir = java.nio.file.Files
      .createTempDirectory("graft-statesegs").toString
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def bytes(p: String): Long =
      if (fs.exists(new org.apache.hadoop.fs.Path(p)))
        fs.getContentSummary(new org.apache.hadoop.fs.Path(p)).getLength
      else 0L
    val recrawl = uk.filter(Sampling.hashBucket(col("ukey"),
        "statesegs") < 10).localCheckpoint(true)
    println(s"[deltascale/statesegs] ${uk.count()} docs, " +
      s"${recrawl.count()} keys re-crawled per round")
    var chain: Option[Graft.KeyedCorpusShardsState] = None
    var base = 0L
    for (b <- 0 to 3) {
      val batch =
        if (b == 0) uk
        else recrawl.withColumn("text",
          concat(col("text"), lit(s" rev $b"))).localCheckpoint(true)
      val t0 = System.nanoTime()
      S.writeRekeyedCorpusShardBatch(batch, b.toLong, outDir, "text",
        "ukey", "lang", tok, 256, "ingest", P,
        stateCompactEveryBatches = 3)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[deltascale/statesegs] batch $b: $wall%.1f s, segment " +
        f"${bytes(s"$outDir/keepers/v=$b") / 1024} KiB + flips " +
        f"${bytes(s"$outDir/keeperflips/v=$b") / 1024} KiB written " +
        f"(base at rest ${bytes(s"$outDir/keepersbase") / 1024} KiB " +
        "= the full-chain rewrite each batch used to pay)")
      // the in-memory full chain (the batch API) over the same deltas
      val (rd, nb) = Graft.withIngestIds(batch, "ukey", base = base,
        salt = "ingest")
      base = nb
      val (sh, st) = Graft.rekeyedCore(rd.localCheckpoint(true), "text",
        "ingest_id", "ukey", "lang", tok, chain, P, 256,
        checkIdOrder = false)
      sh.count(); chain = Some(st)
    }
    // the fold compacts BELOW its watermark (dead re-delivery rows
    // dropped — the retention working as designed), so the honest
    // equality is compact-to-compact: compact(view) must equal
    // compact(full chain) row for row (the ApiSpec absorb-equality
    // family, here proven at corpus scale over the persisted layout)
    val view = S.readRekeyedKeeperState(spark, outDir).get
    val full = chain.get.keepers.select(view.columns.map(col): _*)
    def cpt(df: DataFrame): DataFrame =
      Graft.corpusRekeyedStateCompact(
        Graft.KeyedCorpusShardsState(df, df), "ukey", "ingest_id").keepers
    val vC = cpt(view).localCheckpoint(true)
    val fC = cpt(full).localCheckpoint(true)
    val d = vC.exceptAll(fC).count() + fC.exceptAll(vC).count()
    println(s"[deltascale/statesegs] compact(reconstructed view) vs " +
      s"compact(in-memory full chain): " +
      (if (d == 0) "EXACT MATCH" else s"DIVERGED ($d rows)") +
      s"; view rows=${view.count()} (full chain ${full.count()})")
    spark.stop()
    if (d != 0) sys.exit(1)
  }

  /** `compact` mode (third arg): measure TAIL-ONLY rekeyed compaction
    * against the from-zero fallback at corpus scale — the SCALING.md
    * evidence that compaction cost tracks the TAIL (tokens at/after the
    * first supersession), not the stream. One base delta ingests the
    * whole corpus under the latest-wins keyed loop; then for each tail
    * depth a second delta re-delivers exactly the keys holding the
    * stream-tail ingest ids with changed content, and both compaction
    * paths run over the same state (the fallback forced by dropping the
    * state's n_tokens column — the pre-r16 shape). Outputs must match
    * row-for-row; exits nonzero otherwise.
    *
    *   DeltaScale [documentsDir] [ignored] compact
    */
  private def compactProbe(spark: SparkSession, docs: DataFrame): Unit = {
    val uk = docs.withColumn("ukey",
        concat(lit("u-"), reverse(col("doc_id").cast("string"))))
      .drop("doc_id")
    val (r1raw, b1) = Graft.withIngestIds(uk, "ukey")
    val r1 = r1raw.localCheckpoint(true)
    val n = r1.count()
    println(s"[deltascale/compact] $n docs re-id'd")
    // rekeyedCore directly (every doc "gated in"): the comparison is
    // re-encode COST tail vs stream, and the quality gate at this
    // synthetic corpus keeps <1% — gating would shrink the live set
    // until fixed per-probe overheads dominate both paths and the
    // measurement says nothing about 100 TB
    val (merges, dict0) = Bpe.train(r1, "text", 8)
    val dict = dict0.cache(); dict.count()
    val tok = Bpe.Tokenizer(merges, dict, Bpe.vocabIds(dict))
    val P = Graft.RekeyPolicy.LatestWins
    val (s1, st1) = Graft.rekeyedCore(r1, "text", "ingest_id", "ukey",
      "lang", tok, state = None, policy = P, ctxTokens = 256,
      checkIdOrder = true)
    val s1c = s1.localCheckpoint(true)
    println(s"[deltascale/compact] base pass emitted ${s1c.count()} shards")
    def fpq(df: DataFrame): DataFrame =
      df.select(col("lang"), col("shard_id"), col("n_tokens"),
        md5(array_join(transform(col("token_ids"),
          i => i.cast("string")), ",")).as("ids"))
    var bad = 0L
    for (tailPerMille <- Seq(1, 100)) {
      spark.catalog.clearCache(); dict.cache().count(); System.gc()
      // re-deliver the keys holding the LAST tailPerMille‰ of ingest
      // ids — tail-depth by construction, whatever the hash order did
      val lateKeys = r1.orderBy(col("ingest_id").desc)
        .limit(math.max(1, (n * tailPerMille / 1000).toInt))
        .select(col("ukey"))
      val recrawl = r1.join(lateKeys, Seq("ukey"), "left_semi")
        .withColumn("text", concat(col("text"), lit(" tail revision")))
        .drop("ingest_id")
      val (r2raw, _) = Graft.withIngestIds(recrawl, "ukey", base = b1)
      val r2 = r2raw.localCheckpoint(true)
      val (s2, st2) = Graft.rekeyedCore(r2, "text", "ingest_id", "ukey",
        "lang", tok, state = Some(st1), policy = P, ctxTokens = 256,
        checkIdOrder = true)
      val emitted = s1c.unionByName(s2.localCheckpoint(true))
      val union = r1.unionByName(r2)
      // timed region = the compaction action alone (count materializes
      // every shard row); the md5 fingerprint equality runs UNTIMED
      // after — fingerprinting 776k reused shards would otherwise
      // swamp the tail-sized work being measured
      def timed(label: String)(f: => DataFrame): DataFrame = {
        spark.catalog.clearCache(); dict.cache().count(); System.gc()
        val t0 = System.nanoTime()
        val out = f.localCheckpoint(true)
        println(f"[deltascale/compact] tail=${tailPerMille}‰ $label: " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s (${out.count()} shards)")
        out
      }
      val tail = timed("TAIL-ONLY compact") {
        Graft.corpusShardsRekeyedCompact(union, "text", "ingest_id",
          "lang", tok, st2, emitted)
      }
      val full = timed("from-zero fallback") {
        Graft.corpusShardsRekeyedCompact(union, "text", "ingest_id",
          "lang", tok,
          Graft.KeyedCorpusShardsState(st2.keepers.drop("n_tokens"),
            st2.shards),
          emitted)
      }
      val d = fpq(tail).exceptAll(fpq(full)).count() +
        fpq(full).exceptAll(fpq(tail)).count()
      println(s"[deltascale/compact] tail=${tailPerMille}‰ equality: " +
        (if (d == 0) "EXACT MATCH" else s"DIVERGED ($d rows)"))
      bad += d
    }
    spark.stop()
    if (bad != 0) sys.exit(1)
  }
}
