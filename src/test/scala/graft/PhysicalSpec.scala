package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.Writers
import graft.queries.Parity

/** Physical-plan assertions: the scale mechanisms must actually show up in
  * the executed plan, not just in intent (SURVEY.md §4, prompt: "explain
  * the plan and iterate until it's the plan you'd want").
  */
class PhysicalSpec extends SparkSpec {

  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, BroadcastQueryStageExec, QueryStageExec}
  import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
  import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

  /** Final-plan operator walk. String-parsing `executedPlan.toString` broke
    * once cached subplans appeared: an InMemoryRelation prints its OWN
    * nested `== Final/Initial Plan ==` sections, so splitting on the first
    * `== Initial Plan ==` truncates (or double-counts) everything after the
    * first cache boundary. Walking the tree sees each materialized operator
    * exactly once: adaptive plans resolve to their executed plan, query
    * stages to their contents, reused exchanges count once, and cache
    * boundaries stop the walk (the cached plan is a separate query).
    */
  private def finalOps(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => finalOps(a.executedPlan)
    case q: QueryStageExec => q +: finalOps(q.plan)
    case i: InMemoryTableScanExec => Seq(i)
    case r: ReusedExchangeExec => Seq(r)
    case other => other +: other.children.flatMap(finalOps)
  }

  /** One-line description of a node (no children). */
  private def line(p: SparkPlan): String = p.simpleString(20)

  /** [[finalOps]] plus the contents of each DISTINCT cached plan (a cache
    * scanned from several join sides must not double-count its operators).
    */
  private def finalOpsWithCaches(p: SparkPlan): Seq[SparkPlan] = {
    // transitive over nested caches; per-use InMemoryRelation copies share
    // one CachedRDDBuilder — that is the cache's identity (plan-id differs
    // per copy). Reference identity, not hashCode: an identity-hash COLLISION
    // between distinct builders would silently drop a cached plan from the
    // audit if we kept a Set[Int]
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[AnyRef, java.lang.Boolean]())
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val top = finalOps(p)
      val caches = top
        .collect { case i: InMemoryTableScanExec => i.relation }
        .filter(r => seen.add(r.cacheBuilder))
        .map(_.cachedPlan)
      top ++ caches.flatMap(walk)
    }
    walk(p)
  }

  test("date-partitioned write → time filter prunes partitions at plan time") {
    val dir = Files.createTempDirectory("graft-part").toString
    val daily = Parity.daily(spark, TestSpark.sf0001)
    Writers.parquetPartitioned(daily, s"$dir/daily_by_date", Seq("date"))
    val filtered = spark.read.parquet(s"$dir/daily_by_date")
      .filter(col("date") === lit("2024-01-10"))
    val formatted = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the date predicate must land in PartitionFilters (file-level pruning),
    // not in PushedFilters (row-group level)
    val pf = formatted.linesIterator
      .find(_.trim.startsWith("PartitionFilters")).getOrElse("")
    assert(pf.contains("2024-01-10"), s"no partition pruning:\n$formatted")
    assert(filtered.count() ==
      Parity.daily(spark, TestSpark.sf0001)
        .filter(col("date") === lit("2024-01-10")).count())
  }

  test("bucketed tables join without a shuffle on the bucket key") {
    val dir = Files.createTempDirectory("graft-bucket").toString
    val daily = Parity.daily(spark, TestSpark.sf0001)
    Writers.bucketedTable(daily, "daily_a", s"$dir/a", "user_id", 4)
    Writers.bucketedTable(
      daily.groupBy("user_id").agg(count(lit(1)).as("n_days")),
      "daily_b", s"$dir/b", "user_id", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("daily_a").join(spark.table("daily_b"), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not re-shuffle:\n$plan")
      // daily_b has one row per user → the join preserves daily_a's rows
      assert(joined.count() == daily.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed keeper state: the history side of the keeper anti-join " +
    "scans WITHOUT an Exchange — only the delta shuffles") {
    import spark.implicits._
    val docs = graft.io.Tables.documents(spark, TestSpark.sf0001)
    val history = docs.filter(col("doc_id") < 400)
    val delta = docs.filter(col("doc_id") >= 400)
    val keepers = graft.ext.Dedup.exactGroups(history, "text", "doc_id")
      .select(col("content_hash"))
    val offsets = Seq(("en", 0L, 0L)).toDF("lang", "tok_total", "max_id")
    val dir = Files.createTempDirectory("graft-buckstate").toString
    graft.api.Graft.corpusStateSave(
      graft.api.Graft.CorpusState(keepers, offsets), dir, bucketBy = 4)
    val loaded = graft.api.Graft.corpusStateLoad(spark, dir)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // at scale the history side never broadcasts — force the
      // distributed shape the layout exists for
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val anti = delta.join(loaded.keepers,
        graft.ext.Dedup.digest(col("text")) ===
          loaded.keepers("content_hash"), "left_anti")
      anti.count()
      val ops = finalOps(anti.queryExecution.executedPlan)
      val exchanges = ops.filter(o => line(o).startsWith("Exchange"))
      assert(exchanges.size == 1,
        "the keeper anti-join over a bucketed history must shuffle ONLY " +
          s"the delta side:\n${anti.queryExecution.executedPlan}")
      // and the surviving shuffle is the delta's digest, not the history
      assert(exchanges.forall(e => line(e).contains("md5")),
        s"the one Exchange is not the delta side:\n${exchanges.map(line)}")
      // the plain (unbucketed) state pays a second, history-sized shuffle
      val dirP = Files.createTempDirectory("graft-plainstate").toString
      graft.api.Graft.corpusStateSave(
        graft.api.Graft.CorpusState(keepers, offsets), dirP)
      val loadedP = graft.api.Graft.corpusStateLoad(spark, dirP)
      val antiP = delta.join(loadedP.keepers,
        graft.ext.Dedup.digest(col("text")) ===
          loadedP.keepers("content_hash"), "left_anti")
      antiP.count()
      val exchangesP = finalOps(antiP.queryExecution.executedPlan)
        .filter(o => line(o).startsWith("Exchange"))
      assert(exchangesP.size == 2,
        "control: the plain-layout history side should shuffle " +
          s"(got ${exchangesP.size} exchanges)")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("key-bucketed rekeyed state: FirstWins' seen-key anti-join scans " +
    "history WITHOUT an Exchange — only the delta shuffles") {
    import spark.implicits._
    val docs = graft.io.Tables.documents(spark, TestSpark.sf0001)
    def uk(d: org.apache.spark.sql.DataFrame) =
      d.withColumn("ukey",
        concat(lit("u-"), reverse(col("doc_id").cast("string"))))
    val keepers = uk(docs.filter(col("doc_id") < 400))
      .select(col("ukey"), md5(col("text")).as("content_hash"),
        col("doc_id").as("ingest_id"), col("lang"),
        lit(true).as("kept"), lit(true).as("live"),
        lit(10L).as("n_tokens"))
    val shardsSt = Seq(("en", 0L, Seq.empty[Int], 0L))
      .toDF("lang", "tok_total", "tail_ids", "max_id")
    val delta = uk(docs.filter(col("doc_id") >= 400))
      .select(col("ukey"), col("text"), col("lang"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // key-bucketed layout: the seen-key cut (EXACTLY the rekeyedCore
      // join — keyIndex when present) shuffles only the delta
      val dir = Files.createTempDirectory("graft-keybuck").toString
      graft.api.Graft.corpusRekeyedStateSave(
        graft.api.Graft.KeyedCorpusShardsState(keepers, shardsSt),
        dir, bucketBy = 4, keyCol = "ukey")
      val loaded = graft.api.Graft.corpusRekeyedStateLoad(spark, dir)
      assert(loaded.keyIndex.isDefined,
        "key-bucketed save must come back with a key index")
      assert(loaded.keyIndex.get.count() ==
        keepers.select(col("ukey")).distinct().count())
      val cut = delta.join(loaded.keyIndex.get, Seq("ukey"), "left_anti")
      cut.count()
      val exchanges = finalOps(cut.queryExecution.executedPlan)
        .filter(o => line(o).startsWith("Exchange"))
      assert(exchanges.size == 1,
        "the FirstWins key cut over a key-bucketed seen-key table must " +
          s"shuffle ONLY the delta:\n${cut.queryExecution.executedPlan}")
      // control: a save WITHOUT the key layout falls back to a distinct
      // over the digest-bucketed keepers — history shuffles on the key
      val dirP = Files.createTempDirectory("graft-keyplain").toString
      graft.api.Graft.corpusRekeyedStateSave(
        graft.api.Graft.KeyedCorpusShardsState(keepers, shardsSt),
        dirP, bucketBy = 4)
      val loadedP = graft.api.Graft.corpusRekeyedStateLoad(spark, dirP)
      assert(loadedP.keyIndex.isEmpty)
      val cutP = delta.join(
        loadedP.keepers.select(col("ukey")).distinct(),
        Seq("ukey"), "left_anti")
      cutP.count()
      val exchangesP = finalOps(cutP.queryExecution.executedPlan)
        .filter(o => line(o).startsWith("Exchange"))
      assert(exchangesP.size >= 2,
        "control: the digest-bucketed history should shuffle for the " +
          s"key cut (got ${exchangesP.size} exchanges)")
      // value equality: the key-indexed cut and the distinct-fallback
      // cut are the same rows — the layout changes the plan, not the set
      assert(cut.exceptAll(cutP).count() == 0 &&
        cutP.exceptAll(cut).count() == 0,
        "key-indexed cut diverged from the distinct fallback")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("aggregation spine stays inside whole-stage codegen") {
    val df = SparkEntry.queries("q_daily_agg")(spark, TestSpark.sf0001)
    df.collect() // AQE finalizes THIS queryExecution (count() would spawn its own)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no codegen spans in:\n$plan")
  }

  test("filters and projection reach the parquet scan") {
    val df = SparkEntry.queries("q_filtered_agg")(spark, TestSpark.sf0001)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("PushedFilters") &&
      formatted.contains("In(user_id"), s"filters not pushed:\n$formatted")
    // column pruning: props is only null-checked, never read downstream —
    // the scan schema must stay narrow (5 of 6 columns, no event_id)
    assert(!formatted.contains("event_id"), "event_id should be pruned")
  }

  test("native graft_dot is codegen'd inside the ANN candidate join") {
    val df = SparkEntry.queries("q_ann_ivf")(spark, TestSpark.sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_dot"), s"expected graft_dot in:\n$plan")
    assert(plan.contains("*("), s"no codegen spans in:\n$plan")
    // normalization must be the one-pass graft_unit expression, not the
    // interpreted higher-order transform() it replaced (O(d²) per row —
    // the 100× probe's bottleneck, SCALING.md)
    assert(plan.contains("graft_unit"), s"expected graft_unit in:\n$plan")
    assert(!plan.contains("transform("),
      s"interpreted HOF normalize crept back in:\n$plan")
  }

  test("brute-force baseline broadcasts the probe side, one corpus pass") {
    val df = SparkEntry.queries("q_ann_bruteforce")(spark, TestSpark.sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // an unhinted cross join plans CartesianProduct, which re-evaluates
    // the corpus scan + normalize per left partition (measured 45 s at a
    // 200k corpus vs ~2 s broadcast — SCALING.md, ANN at 100×)
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"expected the 5-row probe side broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"cartesian re-evaluates the corpus side per left partition:\n$plan")
  }

  test("sessionization pays ONE shuffle + ONE sort for all its windows") {
    val df = graft.feat.Sessions.assignSessions(
      graft.io.Tables.events(spark, TestSpark.sf0001), "user_id", "ts", 30)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // lag → boundary flag → running index are DEPENDENT window exprs, so
    // Catalyst keeps two Window nodes — but both share the (user_id, __us)
    // spec, so the plan must have exactly one Exchange and one Sort (a
    // second of either would mean the specs diverged)
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.linesIterator.count(_.contains("Exchange hash")) == 1,
      s"expected exactly 1 shuffle:\n$plan")
    assert(finalPlan.linesIterator.count(_.contains("Sort [")) == 1,
      s"expected exactly 1 sort:\n$plan")
    // the FULL rollup must also stay at one hash exchange: the groupBy
    // (user, session) reuses the window's HashPartitioning(user) — a
    // regression here doubles the operator's shuffle count silently
    val roll = graft.feat.Sessions.sessionize(
      graft.io.Tables.events(spark, TestSpark.sf0001), "user_id", "ts", 30)
    roll.collect()
    val rollPlan = roll.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(rollPlan.linesIterator.count(_.contains("Exchange hash")) == 1,
      s"rollup should reuse the window partitioning:\n$rollPlan")
  }

  test("shardTokens: the shard aggregate reuses the offset window's " +
    "stream-key exchange — token rows never reshuffle") {
    import spark.implicits._
    // enough rows that AQE cannot collapse everything into one partition
    // before the window (which would make the claim vacuous)
    val enc = (1L to 500L).map(i =>
        (s"s${i % 7}", i, 3L, Seq(i.toInt, -i.toInt, 0)))
      .toDF("stream", "id", "n_tokens", "token_ids")
    val df = graft.ext.Packing.shardTokens(enc, Seq("stream"), "id", 4)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // exactly ONE hash exchange (the window's, on the stream key): the
    // (stream, shard) aggregate is clustered by any partitioning on the
    // stream key, so the corpus-token-sized posexplode output must flow
    // into the aggregate WITHOUT its own shuffle — the documented scale
    // property of the shard writer (scaladoc + SCALING.md round 13)
    assert(plan.linesIterator.count(_.contains("Exchange hash")) == 1,
      s"token rows reshuffled — the window exchange was not reused:\n$plan")
  }

  test("count-min: sketch broadcasts, scan reads only the key, top-k is " +
    "TakeOrderedAndProject") {
    val df = SparkEntry.queries("q_countmin")(spark, TestSpark.sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the depth×width sketch must ride a broadcast join — a shuffled probe
    // would re-shuffle the whole key set against 256 rows
    assert(plan.contains("BroadcastHashJoin"), s"sketch not broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top-k sorts:\n$plan")
    // the exact pre-agg reads nothing but the key column
    assert(plan.contains("ReadSchema: struct<user_id:bigint>"),
      s"scan reads more than the key:\n$plan")
  }

  test("bm25: corpus stats and term df broadcast; top-k is " +
    "TakeOrderedAndProject") {
    val df = SparkEntry.queries("q_bm25")(spark, TestSpark.sf0001)
    df.collect()
    val ops = finalOps(df.queryExecution.executedPlan)
    // dfreq (≤ |queryTerms| rows) and the 1-row stats frame are forced
    // broadcasts — shuffling postings against them would be the inverted-
    // index anti-pattern. Dedup by the canonicalized underlying exchange:
    // an AQE-reused broadcast materializes as a second stage node, and
    // counting stages would let ONE broadcast reused twice satisfy the
    // two-independent-small-sides guarantee.
    val distinctBroadcasts = ops
      .collect { case b: BroadcastQueryStageExec => b.plan match {
        case r: ReusedExchangeExec => r.child.canonicalized
        case p => p.canonicalized
      } }
      .distinct
    assert(distinctBroadcasts.size >= 2,
      s"dfreq/stats should broadcast:\n${df.queryExecution.executedPlan}")
    assert(ops.exists(o => line(o).startsWith("TakeOrderedAndProject")),
      s"top-k sorts:\n${df.queryExecution.executedPlan}")
  }

  test("prefix-jaccard: rank and size windows share one shuffle + sort") {
    val df = SparkEntry.queries("q_prefix_jaccard")(spark, TestSpark.sf0001)
    df.collect()
    // the candidate-pair frame is cached; its windows live in the cached plan
    val ops = finalOpsWithCaches(df.queryExecution.executedPlan)
    // TWO windows total (r20): dft is a pre-AGGREGATE keyed by the shingle
    // joined back (guide §2.3 — the r17 third window over the shingle
    // partition exchanged and SORTED the full exploded stream), so the
    // plan must carry a hash aggregate on s and only the two doc_id
    // windows. Those two must still share one partitioning: one Exchange,
    // one Sort for both — the second diverging to its own spec would
    // double the shuffle.
    val allWins = ops.filter(o => line(o).startsWith("Window "))
    assert(allWins.size == 2,
      s"expected 2 window nodes:\n${df.queryExecution.executedPlan}")
    assert(!allWins.exists(o => line(o).contains("[s#")),
      s"dft must be an aggregate, not a shingle window:\n${
        df.queryExecution.executedPlan}")
    assert(ops.exists(o => line(o).startsWith("HashAggregate") &&
      line(o).contains("keys=[s#")),
      s"no shingle-keyed dft aggregate:\n${df.queryExecution.executedPlan}")
    val wins = allWins.filter(o => line(o).contains("[doc_id"))
    assert(wins.size == 2,
      s"expected 2 doc_id window nodes:\n${df.queryExecution.executedPlan}")
    // the two windows must share one partitioning: the inner window sits in
    // the outer's subtree with NO Exchange (and no re-Sort) between them
    def path(root: SparkPlan, target: SparkPlan): Option[Seq[SparkPlan]] =
      if (root eq target) Some(Seq(root))
      else root.children.view.flatMap(c => path(c, target)).headOption
        .map(root +: _)
    val between = wins.view
      .flatMap(o => wins.filter(_ ne o).flatMap(i => path(o, i)))
      .headOption
      .getOrElse(fail(s"windows not nested:\n${df.queryExecution.executedPlan}"))
    assert(!between.exists(n => line(n).startsWith("Exchange")),
      s"exchange between the two windows:\n${df.queryExecution.executedPlan}")
    assert(!between.exists(n => line(n).startsWith("Sort")),
      s"re-sort between the two windows:\n${df.queryExecution.executedPlan}")
  }

  test("hash sample is a narrow filter — no shuffle, no extra columns read") {
    val df = SparkEntry.queries("q_hash_sample")(spark, TestSpark.sf0001)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // membership test is per-row → everything before the final orderBy must
    // be exchange-free, and the scan must not read text/source
    assert(!formatted.contains("\"text\""), "text should be pruned")
    val beforeSort = formatted.split("Sort").head
    assert(!beforeSort.contains("Exchange hashpartitioning"),
      s"sampling filter should not shuffle:\n$formatted")
  }

  test("corpus curation: keeper semi-join leaves the doc side unshuffled") {
    val df = SparkEntry.queries("q_corpus_curation")(spark, TestSpark.sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // dedup-keeper filtering must be a semi join that never RE-shuffles the
    // doc side: the probe reuses the Spread.cpu repartition on doc_id (one
    // deliberate shuffle of the scan — see Spread's scaladoc; a no-op at
    // corpus scale), so at most the digest agg, the tiny keeper build side,
    // and the final small agg exchange (+ the output sort). Nothing forces
    // a broadcast, so at corpus scale the join degrades to shuffled-semi
    // (only the keeper side moves) instead of an OOM.
    assert(plan.contains("LeftSemi"), s"no semi join in:\n$plan")
    // the four expected exchanges — the Spread doc_id repartition, the
    // digest agg, the keeper build side (the probe side REUSES the Spread
    // partitioning), the final small agg — and not one more: a fifth would
    // mean the semi join started re-shuffling the doc side, the exact
    // degradation this test pins
    val hashExchanges = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 4, s"expected exactly 4 hash shuffles:\n$plan")
  }

  test("vocab top-k runs as TakeOrderedAndProject, not a global sort") {
    val df = SparkEntry.queries("q_vocab_topk")(spark, TestSpark.sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // orderBy+limit must fuse into partial top-k per partition + driver
    // merge — a full distributed Sort before a limit(20) would shuffle the
    // entire vocabulary
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"unexpected global sort:\n$plan")
  }

  test("LSH hot-bucket cap anti-join broadcasts (never shuffles the cut)") {
    val df = graft.ext.Dedup.minHashLsh(
      graft.io.Tables.documents(spark, TestSpark.sf0001), "text", "doc_id",
      maxBandBucket = 100)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"), s"expected broadcast anti join in:\n$plan")
  }

  test("sequence packing: pack summary reuses the window's partitioning") {
    import graft.ext.Packing
    val docs = graft.io.Tables.documents(spark, TestSpark.sf0001)
      .withColumn("n_tokens",
        size(graft.ext.TextAnalysis.tokens(col("text"))).cast("long"))
    val df = Packing.packSummary(
      Packing.packByOffset(docs, Seq("lang"), "doc_id", "n_tokens", 256),
      Seq("lang"), "doc_id", "n_tokens")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // groupBy(lang, pack_id) is satisfied by the window's
    // HashPartitioning(lang) (subset guarantee) — exactly ONE hash exchange
    assert(plan.linesIterator.count(_.contains("Exchange hash")) == 1,
      s"pack summary should reuse the window shuffle:\n$plan")
  }

  test("stratified sample prunes per-partition before the shuffle") {
    val df = graft.ext.Sampling.stratifiedSample(
      graft.io.Tables.documents(spark, TestSpark.sf0001), Seq("lang"),
      "doc_id", "strat", 5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // rank <= n must push down as WindowGroupLimit on BOTH sides of the
    // exchange — the partial pass caps what each input task ships
    assert(plan.linesIterator.count(_.contains("WindowGroupLimit")) == 2,
      s"expected partial+final WindowGroupLimit in:\n$plan")
  }

  test("document chunking is a narrow explode — zero shuffles") {
    val df = graft.ext.Packing.chunkTokens(
      graft.io.Tables.documents(spark, TestSpark.sf0001), "text", "doc_id",
      32, 24)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("range-sorted layout gives files disjoint key ranges") {
    val dir = Files.createTempDirectory("graft-range").toString
    val daily = Parity.daily(spark, TestSpark.sf0001)
    Writers.rangeSortedParquet(daily, s"$dir/by_user", Seq("user_id"), 4)
    val files = new java.io.File(s"$dir/by_user").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length >= 2)
    // every file owns a disjoint user range → footer min/max stats can
    // prune whole files for a user_id predicate
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("user_id")), max(col("user_id"))).head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2,
        s"overlapping file ranges: ${ranges.toSeq}")
      case _ =>
    }
    // and the data round-trips intact
    assert(spark.read.parquet(s"$dir/by_user").count() == daily.count())
  }

  test("date-partitioned write prunes the scan to matching date dirs (P5)") {
    // SURVEY §7.4.8: raw/daily output partitioned by date so the
    // chronological train/test split (P5) prunes whole directories at plan
    // time — the difference between scanning a day and scanning 100 TB.
    val dir = Files.createTempDirectory("graft-ppart").toString
    val daily = Parity.daily(spark, TestSpark.sf0001)
    Writers.parquetPartitioned(daily, s"$dir/daily_by_date", Seq("date"))
    val root = new java.io.File(s"$dir/daily_by_date")
    val dateDirs = root.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("date="))
    assert(dateDirs.length >= 3,
      s"expected several date partitions, got ${dateDirs.length}")
    val totalFiles = dateDirs.flatMap(_.listFiles())
      .count(_.getName.endsWith(".parquet"))
    val back = spark.read.parquet(s"$dir/daily_by_date")
    val cutoff = back.agg(max(col("date"))).head.get(0)
    val expectedFiles = dateDirs.filter(_.getName == s"date=$cutoff")
      .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    assert(expectedFiles >= 1 && expectedFiles < totalFiles)
    val df = back.filter(col("date") === lit(cutoff))
    df.collect()
    val scan = finalOps(df.queryExecution.executedPlan).collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScan in plan"))
    // plan-time evidence: the date predicate landed as a PARTITION filter
    assert(scan.partitionFilters
        .exists(_.references.exists(_.name == "date")),
      s"date not a partition filter: ${scan.partitionFilters}")
    // runtime evidence: only the matching partition's files were opened
    assert(scan.metrics("numFiles").value == expectedFiles,
      s"scan read ${scan.metrics("numFiles").value} files of $totalFiles; " +
        s"expected only the $expectedFiles matching files")
  }

  test("LOCF fill reuses the grid's key partitioning under broadcast") {
    import spark.implicits._
    val obs = (1L to 50L).flatMap(k => Seq(
        (k, java.sql.Date.valueOf("2024-01-01"), 1.0),
        (k, java.sql.Date.valueOf("2024-01-05"), 5.0)))
      .toDF("k", "d", "v")
    val df = graft.feat.Resample.dailyLocf(obs, "k", "d", "v")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // broadcast obs side → the only hash exchange is the span aggregate's;
    // the fill window rides the grid's HashPartitioning(k)
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast:\n$plan")
    assert(plan.linesIterator.count(_.contains("Exchange hash")) == 1,
      s"LOCF fill should not add an exchange:\n$plan")
  }

  test("null-safe equality plans as a hash join, not nested-loop") {
    val df = SparkEntry.queries("q_nullsafe_join")(spark, TestSpark.sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected BroadcastHashJoin in:\n$plan")
    assert(!plan.contains("NestedLoop"),
      s"null-safe join fell back to nested-loop:\n$plan")
  }

  test("Q3-shape join pushes all three filters into the parquet scans") {
    val df = SparkEntry.queries("q_top_unshipped")(spark, TestSpark.sf0001)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // each filter must reach its scan as a pushed predicate — a Q3 that
    // filters after the join re-reads the full fact tables
    for (c <- Seq("l_shipdate", "o_orderdate", "c_mktsegment")) {
      val pushed = formatted.linesIterator.exists(l =>
        l.trim.startsWith("PushedFilters") && l.contains(c))
      assert(pushed, s"$c not pushed to scan:\n$formatted")
    }
    // top-10 by revenue must be a partial top-k, not a global sort
    df.collect()
    assert(df.queryExecution.executedPlan.toString
        .contains("TakeOrderedAndProject"),
      "expected TakeOrderedAndProject for ORDER BY + LIMIT")
  }

  test("span dedup shuffles text once; hot-span membership broadcasts") {
    val df = SparkEntry.queries("q_span_dedup")(spark, TestSpark.sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the span column (carrying text payload) crosses exactly the Spread
    // repartition; the frequency cut must join as a broadcast, never a
    // shuffled join of the corpus against itself
    assert(plan.contains("BroadcastHashJoin"),
      s"hot-span membership should broadcast:\n$plan")
    val spanShuffles = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && l.contains("span#"))
    assert(spanShuffles <= 1, s"span payload crosses >1 shuffle:\n$plan")
  }

  test("decile stats: rank window is bucket-partitioned — no " +
    "single-partition window, no ntile") {
    val df = SparkEntry.queries("q_decile_stats")(spark, TestSpark.sf0001)
    df.collect()
    val ops = finalOpsWithCaches(df.queryExecution.executedPlan)
    val plan = df.queryExecution.executedPlan.toString
    // the old plan ran ntile(10) over an UNPARTITIONED window: an Exchange
    // SinglePartition funneling every per-user total through one task
    assert(!plan.contains("ntile"), s"global ntile survived:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"single-partition exchange in:\n$plan")
    // the distributed form ranks INSIDE each coarse value bucket: the
    // row_number window's spec must lead with the bucket column
    val wins = ops.filter(o => line(o).startsWith("Window"))
    assert(wins.nonEmpty, s"expected a rank window in:\n$plan")
    wins.foreach(w => assert(line(w).contains("windowspecdefinition(__b#"),
      s"window not partitioned by bucket: ${line(w)}"))
  }

  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    import spark.implicits._
    // 1 hot key carrying ~all rows + a uniform tail, joined to a dim too
    // big to broadcast under the lowered threshold — AQE must mark the
    // sort-merge join skew-handled and split the hot partition
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.range(0, 200000)
        .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id"))
          .as("k"), col("id").as("payload"))
      val dim = spark.range(0, 50000)
        .select(col("id").as("k"), (col("id") * 2).as("attr"))
      val joined = fact.join(dim, "k")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffled join:\n$plan")
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("kmeans assignment codegens as ONE ArgMinCentroid at k=256 — " +
    "no 64KB fallback") {
    // k=256 is the cliff point of the k-wide column stack this expression
    // replaced: k typedLit center literals + k round(...) distance columns
    // blew whole-stage codegen's 64KB method limit and silently fell back
    // to interpreted eval. The single-expression form must stay inside a
    // codegen span at that k — constant bytecode, centers as ONE reference
    // object.
    val emb = graft.io.Tables.embeddings(spark, TestSpark.sf0001)
    val df = graft.ext.Similarity.kmeansBuckets(
      emb, "vec_id", "embedding", k = 256, iters = 1)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val assignLines = plan.linesIterator
      .filter(_.contains("graft_argmin_centroid")).toSeq
    assert(assignLines.nonEmpty,
      s"expected graft_argmin_centroid in:\n$plan")
    // whole-stage-codegen'd operators print with a "*(n)" prefix; an
    // interpreted fallback (the old cliff) loses it on exactly this line
    assert(assignLines.forall(_.trim.matches("""^[+:\-\s]*\*\(\d+\).*""")),
      s"assignment fell out of whole-stage codegen:\n$plan")
    // and exactly ONE assignment expression — not a k-wide stack
    assert(!plan.contains("array_min"),
      s"k-wide distance stack crept back in:\n$plan")
    // every row assigned to a real center
    val buckets = df.agg(min(col("bucket")), max(col("bucket")),
      count(when(col("bucket").isNull, 1))).head
    assert(buckets.getInt(0) >= 0 && buckets.getInt(1) < 256 &&
      buckets.getLong(2) == 0, s"bad assignment range: $buckets")
  }

  test("sq8 candidate join moves int8 codes, not float vectors") {
    import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}
    val df = SparkEntry.queries("q_ann_sq8")(spark, TestSpark.sf0001)
    df.collect()
    val ops = finalOpsWithCaches(df.queryExecution.executedPlan)
    val bktJoins = ops.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.leftKeys.exists(_.references.exists(_.name == "bkt")) => j
    }
    assert(bktJoins.nonEmpty, "no bucket equi-join found in the sq8 plan")
    // the whole point of SQ8: the candidate join's rows carry the int8
    // codes (array<int>), never the 8x-larger float vectors — the floats
    // only appear in the post-shortlist re-rank joins keyed by id
    bktJoins.foreach { j =>
      val types = j.output.map(_.dataType)
      assert(types.contains(ArrayType(IntegerType, containsNull = false)) ||
        types.contains(ArrayType(IntegerType, containsNull = true)),
        s"bucket join carries no code arrays: ${j.output.map(_.name)}")
      assert(!types.exists {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }, s"float vector rides the sq8 candidate join: ${j.output.map(_.name)}")
    }
  }

  test("pq candidate join moves m-int codes and the SDC lookup scoring " +
      "stays inside whole-stage codegen") {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val df = SparkEntry.queries("q_ann_pq")(spark, TestSpark.sf0001)
    df.collect()
    val ops = finalOpsWithCaches(df.queryExecution.executedPlan)
    // the PQ point sharpened: the candidate join's rows carry the m
    // sub-codes (2 bytes of payload per vector here), never float vectors
    val bktJoins = ops.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.leftKeys.exists(_.references.exists(_.name == "bkt")) => j
    }
    assert(bktJoins.nonEmpty, "no bucket equi-join found in the pq plan")
    bktJoins.foreach { j =>
      assert(!j.output.map(_.dataType).exists {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }, s"float vector rides the pq candidate join: ${j.output.map(_.name)}")
    }
    // and the table-lookup cosine runs codegen'd — no interpreted
    // fallback in the per-pair hot path
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scoreLines = plan.linesIterator
      .filter(_.contains("graft_pq_cosine")).toSeq
    assert(scoreLines.nonEmpty, s"expected graft_pq_cosine in:\n$plan")
    assert(scoreLines.forall(_.trim.matches("""^[+:\-\s]*\*\(\d+\).*""")),
      s"pq scoring fell out of whole-stage codegen:\n$plan")
  }

  test("residual ivf-pq: corpus side of the candidate join stays codes, " +
      "and the residual-ADC scorer stays inside whole-stage codegen") {
    val df = SparkEntry.queries("q_ann_ivf_pq_res")(spark, TestSpark.sf0001)
    df.collect()
    // by design the PROBE side carries the query floats + probed cell
    // mean (2·dim doubles per (query, cell) row), so no all-sides float
    // assertion here — the corpus compression is what matters at scale:
    // the coded frame in the plan carries (bkt, uid, code) only
    val cachedSchemas = finalOpsWithCaches(df.queryExecution.executedPlan)
      .collect {
        case i: org.apache.spark.sql.execution.columnar
            .InMemoryTableScanExec => i.relation.schema
      }
    assert(cachedSchemas.exists(s =>
      s.fieldNames.toSet == Set("bkt", "uid", "code")),
      s"no codes-only corpus frame cached: ${cachedSchemas.map(_.fieldNames.mkString("(", ",", ")"))}")
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scoreLines = plan.linesIterator
      .filter(_.contains("graft_pq_res_adc_cosine")).toSeq
    assert(scoreLines.nonEmpty,
      s"expected graft_pq_res_adc_cosine in:\n$plan")
    assert(scoreLines.forall(_.trim.matches("""^[+:\-\s]*\*\(\d+\).*""")),
      s"residual-ADC scoring fell out of whole-stage codegen:\n$plan")
  }

  test("servedUids: codes land uid-range-sorted (disjoint per-file " +
    "ranges), the membership probe pushes the candidate span into the " +
    "codes scan, and its result equals the naive full semi-join") {
    val A = graft.ext.AnnIndex
    val emb = graft.io.Tables.embeddings(spark, TestSpark.sf0001)
    val corpus = emb.filter(col("vec_id") % 2 === 0)
    val dir = Files.createTempDirectory("graft-serveduids").toString
    A.build(graft.ext.Similarity.kmeansBuckets(corpus, "vec_id",
        "embedding", k = 8, iters = 2, bucketCol = "kb"),
      "vec_id", "embedding", "kb", dir, dim = 64)
    // an add under shifted uids: appended files must keep the sorted
    // layout (tight disjoint ranges above the base)
    A.add(spark, dir,
      emb.filter(col("vec_id") % 8 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          col("embedding")),
      "vec_id", "embedding")
    // LAYOUT: per-file uid ranges are pairwise disjoint — parquet
    // footers then ARE the per-file uid manifest the probe prunes on
    val ranges = spark.read.parquet(s"$dir/codes")
      .groupBy(input_file_name().as("f"))
      .agg(min(col("uid")).as("lo"), max(col("uid")).as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    assert(ranges.nonEmpty)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"codes file uid ranges overlap: $ranges")
      case _ => ()
    }
    // EQUIVALENCE on a mixed candidate set: present base ids, present
    // added ids, absent ids — servedUids must equal the naive semi-join
    val cands = corpus.limit(20).select(col("vec_id").as("uid"))
      .unionByName(emb.filter(col("vec_id") % 8 === 0).limit(5)
        .select((col("vec_id") + 1000000L).as("uid")))
      .unionByName(spark.range(-50, -40).select(col("id").as("uid")))
    val got = A.servedUids(spark, dir, cands)
      .collect().map(_.getLong(0)).toSet
    val want = spark.read.parquet(s"$dir/codes").select(col("uid"))
      .join(cands.distinct(), Seq("uid"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    assert(got == want, s"servedUids diverged: ${got.diff(want)} / " +
      s"${want.diff(got)}")
    // PUSHDOWN: the candidate span must reach the codes scan as a raw
    // pushed range predicate (a cast-wrapped or absent predicate reads
    // the whole uid column at every absorb — the r17 bottleneck)
    val probe = A.servedUids(spark, dir, cands)
    val formatted = probe.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pushed = formatted.linesIterator.exists(l =>
      l.trim.startsWith("PushedFilters") &&
        l.contains("GreaterThanOrEqual(uid") &&
        l.contains("LessThanOrEqual(uid"))
    assert(pushed, s"candidate uid span not pushed into the codes " +
      s"scan:\n$formatted")
    // OUT-OF-SPAN candidates (ids below the index's uid range): the
    // pushed span predicate prunes every file — zero rows back
    assert(A.servedUids(spark, dir,
      spark.range(-9000, -8900).select(col("id").as("uid"))).isEmpty)
  }
}
