package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time the COMPLETE residual IVF-PQ index BUILD (coarse
  * cells + residual sub-codebooks + codes + persisted artifacts —
  * [[graft.api.Graft.annIndexBuild]], the build-once half of the
  * deployment lifecycle) at production corpus scale, full-corpus vs
  * sampled codebook training — the end-to-end `trainFraction` evidence
  * beyond QuantScale's coarse-only rows. (Serve time is query-driven
  * and training-independent — the codes are full-corpus either way.)
  *
  *   IndexScale [embeddingsDir] [dim]
  *   IndexScale [embeddingsDir] [dim] add   # bloom-guard cost probe
  *   (also: rebuild | supersede | loop | feed — see each probe's doc)
  *
  * `add` mode measures what the r14 uid bloom buys the nightly add():
  * build once, then time a fresh-uid 1% delta add under the bloom (the
  * guard never scans the index) vs on a bloomless copy (the pre-bloom
  * full-semi-join fallback), plus the duplicate path (bloom hit →
  * exact confirm → loud failure).
  */
object IndexScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/emb100")
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.io.Tables.embeddings(spark, dir)
    println(s"[indexscale] ${emb.count()} vectors from $dir")
    if (args.lift(2).contains("add")) { addProbe(spark, emb, dim); spark.stop(); return }
    if (args.lift(2).contains("rebuild")) { rebuildProbe(spark, emb, dim); spark.stop(); return }
    if (args.lift(2).contains("supersede")) { supersedeProbe(spark, emb, dim); spark.stop(); return }
    if (args.lift(2).contains("loop")) { loopProbe(spark, emb, dim); spark.stop(); return }
    if (args.lift(2).contains("feed")) { feedProbe(spark, emb, dim); spark.stop(); return }
    if (args.lift(2).contains("uidscan")) { uidscanProbe(spark, emb, dim); spark.stop(); return }
    if (args.lift(2).contains("tombscan")) { tombscanProbe(spark, emb, dim); spark.stop(); return }
    if (args.lift(2).contains("lifetime")) {
      lifetimeProbe(spark, emb, dim,
        args.lift(3).map(_.toInt).getOrElse(120))
      spark.stop(); return
    }
    for (frac <- Seq(1.0, 0.1); pass <- Seq("cold", "warm")) {
      spark.catalog.clearCache(); System.gc()
      val out = java.nio.file.Files
        .createTempDirectory("graft-indexscale").toString
      val t0 = System.nanoTime()
      graft.api.Graft.annIndexBuild(emb, "vec_id", "embedding", out,
        dim = dim, trainFraction = frac)
      println(f"[indexscale] trainFraction=$frac $pass build: " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }

  /** `feed` mode (r17): does the supersession-feed APPLY stay flat as
    * the published history grows 10×? Build once, then publish feed
    * batches over three decades of history size and time
    * [[graft.streaming.StreamingIndex.applySupersessionFeed]] with the
    * applied-through cursor (reads only the one unapplied batch) vs
    * CURSORLESS (the pre-r17 behavior — cursor dir deleted, reads the
    * whole history). Then fold the history
    * ([[graft.api.Graft.corpusSupersessionFeedCompact]]) and time a
    * fresh consumer's first apply from the archive vs from the dirs.
    */
  private def feedProbe(spark: SparkSession,
                        emb: org.apache.spark.sql.DataFrame,
                        dim: Int): Unit = {
    import org.apache.spark.sql.functions._
    val SI = graft.streaming.StreamingIndex
    val dir = java.nio.file.Files
      .createTempDirectory("graft-feedprobe").toString
    val corpusOut = java.nio.file.Files
      .createTempDirectory("graft-feedprobe-corpus").toString
    def timed(label: String)(f: => Any): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"[indexscale/feed] $label: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    timed(s"build(${emb.count()})") {
      graft.api.Graft.annIndexBuild(emb, "vec_id", "embedding", dir,
        dim = dim, trainFraction = 0.1)
    }
    // each batch retires 500 ids the index never held (negative — the
    // skip path): apply cost is then pure feed read + membership join,
    // the axis under test, with no tombstone accumulation distorting
    // the later measurements
    var nextId = -1L
    var published = 0L
    def publish(n: Int): Unit = {
      (0 until n).foreach { _ =>
        spark.range(nextId - 499, nextId + 1)
          .select(col("id").as("ingest_id"))
          .coalesce(1).write
          .parquet(s"$corpusOut/superseded/batch_id=$published")
        nextId -= 500
        published += 1
      }
    }
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dropCursor(): Unit = {
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/feedcursor"), true)
      ()
    }
    for (hist <- Seq(10, 100, 1000)) {
      publish((hist - published).toInt - 1)
      // cursor catches up on everything but the newest batch
      SI.applySupersessionFeed(spark, corpusOut, dir)
      publish(1)
      timed(s"apply with cursor, history=$hist (1 unapplied batch)") {
        SI.applySupersessionFeed(spark, corpusOut, dir)
      }
      dropCursor()
      timed(s"apply CURSORLESS, history=$hist (re-reads everything)") {
        SI.applySupersessionFeed(spark, corpusOut, dir)
      }
    }
    timed(s"feed compact ($published dirs -> 1 archive snapshot)") {
      graft.api.Graft.corpusSupersessionFeedCompact(spark, corpusOut)
    }
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft-feedprobe2").toString
    timed("build (fresh consumer)") {
      graft.api.Graft.annIndexBuild(emb, "vec_id", "embedding", dir2,
        dim = dim, trainFraction = 0.1)
    }
    timed(s"fresh consumer full catch-up from the ARCHIVE " +
        s"($published batches folded)") {
      SI.applySupersessionFeed(spark, corpusOut, dir2)
    }
  }

  /** `uidscan` mode (r18, VERDICT r17 #1): does the served-uid
    * membership probe — the component behind the keyed absorb's
    * retirement cut and the feed apply — stay FLAT as the index grows
    * 10× at a FIXED delta size? Builds a small and a 10×-larger index,
    * then times [[graft.ext.AnnIndex.servedUids]] on three fixed
    * 500-uid candidate shapes per size:
    *
    *  - ABSENT ids below the index's uid range (the common feed shape —
    *    retired ids of docs the index never embedded, new-generation
    *    ingest ids): the pushed span predicate prunes every file, zero
    *    row IO;
    *  - CLUSTERED present ids (a re-crawl batch's contiguous ingest
    *    range): the pushed uid-span predicate prunes the sorted codes
    *    files/row groups outside the span;
    *  - UNIFORM-SPREAD present ids: the documented degenerate bound —
    *    the span covers everything, cost = one codes uid-column scan
    *    (exactly the pre-r18 cost, never worse).
    *
    * The pre-r18 baseline (naive full semi-join) is timed alongside so
    * the pruning reads as a ratio, not an absolute.
    */
  private def uidscanProbe(spark: SparkSession,
                           emb: org.apache.spark.sql.DataFrame,
                           dim: Int): Unit = {
    import org.apache.spark.sql.functions._
    val A = graft.ext.AnnIndex
    def timed(label: String)(f: => Any): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"[indexscale/uidscan] $label: " +
        f"${(System.nanoTime() - t0) / 1e9}%.3f s ($r)")
    }
    for (mod <- Seq(10, 1)) {
      val corpus = emb.filter(col("vec_id") % mod === 0)
      val n = corpus.count()
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-uidscan-$mod").toString
      graft.api.Graft.annIndexBuild(corpus, "vec_id", "embedding", dir,
        dim = dim, trainFraction = 0.1)
      val root = A.currentRoot(spark, dir)
      val ids = corpus.select(col("vec_id")).orderBy(col("vec_id"))
        .collect().map(_.getLong(0))
      val absent = spark.range(-500, 0).select(col("id").as("uid"))
        .cache(); absent.count()
      val mid = ids.length / 2
      val clustered = spark.createDataset(
        ids.slice(mid, mid + 500).toSeq)(
        org.apache.spark.sql.Encoders.scalaLong).toDF("uid")
        .cache(); clustered.count()
      val step = math.max(1, ids.length / 500)
      val uniform = spark.createDataset(
        ids.indices.by(step).take(500).map(ids).toSeq)(
        org.apache.spark.sql.Encoders.scalaLong).toDF("uid")
        .cache(); uniform.count()
      // warm each path once, then time (the probe isolates scan cost,
      // not JIT)
      Seq(absent, clustered, uniform).foreach(c =>
        A.servedUids(spark, root, c).count())
      timed(s"n=$n absent(500)") {
        A.servedUids(spark, root, absent).count()
      }
      timed(s"n=$n clustered(500)") {
        A.servedUids(spark, root, clustered).count()
      }
      timed(s"n=$n uniform(500)") {
        A.servedUids(spark, root, uniform).count()
      }
      timed(s"n=$n naive full semi-join (pre-r18 baseline)") {
        spark.read.parquet(s"$root/codes").select(col("uid"))
          .join(broadcast(clustered), Seq("uid"), "left_semi").count()
      }
      Seq(absent, clustered, uniform).foreach(_.unpersist())
    }
  }

  /** `tombscan` mode (r19, VERDICT r18 #2): is [[graft.ext.AnnIndex.search]]
    * still fast — and free of any forced O(tombstones) broadcast — at
    * the DRIFT-BUDGET EDGE (~25% of the index tombstoned, the
    * accumulation a caller-chosen `maintain(0.25)` allows before a
    * rebuild purges)? Build, time a warm search at 0% tombstoned,
    * supersede the oldest quarter of the uids (one bulk retirement —
    * the old-generation cut), re-time the SAME search, and report
    * every broadcast exchange's built `dataSize` from the executed
    * plan plus the tombstone family's on-disk bytes. Done-bar: search
    * wall flat (the tombstone cut is one anti-join feeding the same
    * probe; a 25% smaller candidate set if anything) and NO broadcast
    * over 10 MB — above [[graft.ext.AnnIndex.TombstoneBroadcastMaxBytes]]
    * the join is un-hinted, so AQE sizes the strategy from runtime
    * stats instead of the driver force-materializing the set.
    */
  private def tombscanProbe(spark: SparkSession,
                            emb: org.apache.spark.sql.DataFrame,
                            dim: Int): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val A = graft.ext.AnnIndex
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tombscan").toString
    val n = emb.count()
    val t0 = System.nanoTime()
    graft.api.Graft.annIndexBuild(emb, "vec_id", "embedding", dir,
      dim = dim, trainFraction = 0.1)
    println(f"[indexscale/tombscan] build($n): " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    val queries = emb.filter(col("vec_id") % (n / 100) === 1).limit(100)
      .select(col("vec_id"), col("embedding")).cache()
    println(s"[indexscale/tombscan] ${queries.count()} probe queries")
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case q: QueryStageExec => q +: nodes(q.plan)
      case o => o +: o.children.flatMap(nodes)
    }
    def searchOnce(label: String): Unit = {
      // warm once (JIT + artifact cache), then measure
      A.search(spark, dir, queries, "vec_id", "embedding", k = 10,
        nProbe = 2).count()
      System.gc()
      val t = System.nanoTime()
      val df = A.search(spark, dir, queries, "vec_id", "embedding",
        k = 10, nProbe = 2)
      // collect, not count: count() builds a SEPARATE aggregate
      // QueryExecution, leaving df's own walked plan un-executed with
      // every metric at zero (the r19 probe's first run measured that)
      val rows = df.collect().length
      val wall = (System.nanoTime() - t) / 1e9
      val bcasts = nodes(df.queryExecution.executedPlan).collect {
        case b: BroadcastExchangeExec =>
          b.metrics.get("dataSize").map(_.value).getOrElse(-1L)
      }
      val maxMb = bcasts.foldLeft(0L)(math.max) / 1e6
      println(f"[indexscale/tombscan] $label: $wall%.2f s ($rows rows), " +
        f"broadcasts=${bcasts.size} max=${maxMb}%.1f MB " +
        s"(all: ${bcasts.sorted.reverse.take(5).mkString(", ")} bytes)")
    }
    searchOnce(s"search 0% tombstoned (n=$n)")
    val tRet = System.nanoTime()
    A.supersede(spark, dir,
      emb.filter(col("vec_id") < n / 4).select(col("vec_id")), "vec_id")
    println(f"[indexscale/tombscan] supersede oldest 25%% (${n / 4}): " +
      f"${(System.nanoTime() - tRet) / 1e9}%.1f s")
    val root = A.currentRoot(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val conf = spark.sparkContext.hadoopConfiguration
    val tombStats = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$root/tombstones"))
      .filter(st => st.getPath.getName.startsWith("part-") && st.getLen > 0)
    val tombBytes = tombStats.map(_.getLen).sum
    val tombRows = tombStats.map { st =>
      val in = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
      try in.getRecordCount finally in.close()
    }.sum
    println(f"[indexscale/tombscan] tombstones on disk: " +
      f"${tombBytes / 1e6}%.2f MB / $tombRows footer rows " +
      s"(threshold 262144 rows -> ${if (tombRows > (1L << 18))
        "UN-HINTED (AQE decides)" else "hinted broadcast"})")
    searchOnce(s"search 25% tombstoned (n=$n)")
  }

  /** `lifetime` mode (r18, VERDICT r17 #5): per-absorb cost over a
    * 100+ batch lifetime at FIXED delta size — the segment-read
    * amortization evidence the write-side probes don't give. Build +
    * keymap seed, then N [[graft.streaming.StreamingIndex.absorbKeyedDelta]]
    * calls of 200 re-embedded keys each under the default fold cadence
    * (16); prints every 10th absorb's wall plus first-decile vs
    * last-decile means. Flat means the base + ≤cadence segment
    * listings (×3 state families) do not creep with lifetime; creep
    * would argue a lower default cadence or coalesced listings.
    */
  private def lifetimeProbe(spark: SparkSession,
                            emb: org.apache.spark.sql.DataFrame,
                            dim: Int, nBatches: Int): Unit = {
    import org.apache.spark.sql.functions._
    val SI = graft.streaming.StreamingIndex
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lifetime").toString + "/idx"
    val keyed = emb.select(concat(lit("k-"), col("vec_id")).as("key"),
      col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val t0 = System.nanoTime()
    graft.api.Graft.annIndexBuild(emb, "vec_id", "embedding", dir,
      dim = dim, trainFraction = 0.1)
    SI.seedIndexKeymap(spark, dir, keyed, "key", "vec_id")
    println(f"[indexscale/lifetime] build+seed(${emb.count()}): " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s; $nBatches absorbs of " +
      "200 re-embeds each, fold cadence 16")
    val nEmb = emb.count()
    val walls = (0 until nBatches).map { j =>
      // 200 distinct keys per batch, round-robin over the corpus, each
      // re-entering under a fresh uid — every absorb supersedes the
      // previous generation's uids through the keymap, the loop's
      // steady-state shape
      val lo = (j.toLong * 200L) % nEmb
      val batch = keyed
        .filter(col("vec_id") >= lo && col("vec_id") < lo + 200)
        .select(col("key"),
          (col("vec_id") + (j + 1) * 10000000L).as("vec_id"),
          reverse(col("embedding")).as("embedding"))
      val t = System.nanoTime()
      SI.absorbKeyedDelta(spark, dir, batch, "key", "vec_id",
        "embedding", maxAddedFraction = 10.0)
      val w = (System.nanoTime() - t) / 1e9
      if ((j + 1) % 10 == 0)
        println(f"[indexscale/lifetime] absorb ${j + 1}%4d: $w%.2f s")
      w
    }
    val firstDecile = walls.take(nBatches / 10)
    val lastDecile = walls.takeRight(nBatches / 10)
    println(f"[indexscale/lifetime] mean wall: first decile " +
      f"${firstDecile.sum / firstDecile.size}%.2f s, last decile " +
      f"${lastDecile.sum / lastDecile.size}%.2f s (flat = segment reads " +
      "amortized; creep = lower the fold cadence)")
  }

  /** `rebuild` mode: the staleness-alert response loop end to end —
    * build over 2/3 of the corpus, add the remaining 1/3 (the grown
    * state a real deployment rebuilds from), then time
    * [[graft.api.Graft.annIndexRebuild]] (re-learn + re-encode + version
    * swap) and a post-swap add + search. */
  private def rebuildProbe(spark: SparkSession,
                           emb: org.apache.spark.sql.DataFrame,
                           dim: Int): Unit = {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-rebuildprobe").toString
    val base = emb.filter(col("vec_id") % 3 =!= 0)
    val grown = emb.filter(col("vec_id") % 3 === 0)
    val t0 = System.nanoTime()
    graft.api.Graft.annIndexBuild(base, "vec_id", "embedding", dir,
      dim = dim, trainFraction = 0.1)
    println(f"[indexscale/rebuild] build(${base.count()}): " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    val t1 = System.nanoTime()
    graft.api.Graft.annIndexAdd(spark, dir, grown, "vec_id", "embedding")
    println(f"[indexscale/rebuild] add(${grown.count()}): " +
      f"${(System.nanoTime() - t1) / 1e9}%.1f s")
    val t2 = System.nanoTime()
    graft.api.Graft.annIndexRebuild(spark, dir, trainFraction = 0.1)
    println(f"[indexscale/rebuild] rebuild(${emb.count()}): " +
      f"${(System.nanoTime() - t2) / 1e9}%.1f s")
    val t3 = System.nanoTime()
    val post = graft.api.Graft.annIndexSearch(spark, dir,
      emb.limit(1000).select((col("vec_id") + 1000000000L).as("vec_id"),
        col("embedding")),
      "vec_id", "embedding", k = 5)
    println(f"[indexscale/rebuild] post-swap search(1000 q): " +
      f"${post.count()} rows, ${(System.nanoTime() - t3) / 1e9}%.1f s")
  }

  /** `supersede` mode: the latest-wins index lifecycle at scale —
    * build, add a 1/8 re-embed delta under shifted uids, time
    * supersede() of the old uids (delta-sized tombstone write), a
    * tombstone-filtered search, and the purging rebuild. The evidence
    * that retiring stale vectors costs delta work at serve time and the
    * purge is just the standard rebuild. */
  private def supersedeProbe(spark: SparkSession,
                             emb: org.apache.spark.sql.DataFrame,
                             dim: Int): Unit = {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-supersedeprobe").toString
    val reembeds = emb.filter(col("vec_id") % 8 === 0)
      .select((col("vec_id") + 1000000000L).as("vec_id"),
        reverse(col("embedding").cast("array<double>")).as("embedding"))
    val oldUids = emb.filter(col("vec_id") % 8 === 0).select(col("vec_id"))
    def timed(label: String)(f: => Unit): Unit = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      f
      println(f"[indexscale/supersede] $label: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    timed(s"build(${emb.count()})") {
      graft.api.Graft.annIndexBuild(emb, "vec_id", "embedding", dir,
        dim = dim, trainFraction = 0.1)
    }
    timed(s"add(${reembeds.count()} re-embeds)") {
      graft.api.Graft.annIndexAdd(spark, dir, reembeds, "vec_id",
        "embedding")
    }
    timed(s"supersede(${oldUids.count()} old uids)") {
      graft.api.Graft.annIndexSupersede(spark, dir, oldUids, "vec_id")
    }
    timed("tombstone-filtered search (1000 q)") {
      val r = graft.api.Graft.annIndexSearch(spark, dir,
        emb.limit(1000).select((col("vec_id") + 2000000000L).as("vec_id"),
          col("embedding")),
        "vec_id", "embedding", k = 5)
      println(s"[indexscale/supersede]   rows=${r.count()}")
    }
    timed("purging rebuild") {
      graft.api.Graft.annIndexRebuild(spark, dir, trainFraction = 0.1)
    }
    val st = graft.ext.AnnIndex.stats(spark, dir).head()
    println(s"[indexscale/supersede] post-rebuild n_base=" +
      s"${st.getAs[Long]("n_base")} n_tombstoned=" +
      s"${st.getAs[Long]("n_tombstoned")}")
  }

  /** `loop` mode: the STREAMING maintenance path's per-batch cost at
    * production scale — build + keymap seed, then ONE
    * [[graft.streaming.StreamingIndex.writeIndexBatch]] absorb of a 1/8
    * re-embed delta (the nightly shape: supersede old uids + add new
    * vectors + the delta-sized keymap segment), then the same batch RE-DELIVERED
    * (the exactly-once skip — must be marker-check cheap), then a
    * marker-less retry (the crash-recovery convergence path: idempotent
    * supersede + all-coded add skip + segment rewrite).
    */
  private def loopProbe(spark: SparkSession,
                        emb: org.apache.spark.sql.DataFrame,
                        dim: Int): Unit = {
    import org.apache.spark.sql.functions._
    val SI = graft.streaming.StreamingIndex
    val dir = java.nio.file.Files
      .createTempDirectory("graft-loopprobe").toString + "/idx"
    val keyed = emb.select(concat(lit("k-"), col("vec_id")).as("key"),
      col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val batch = emb.filter(col("vec_id") % 8 === 0)
      .select(concat(lit("k-"), col("vec_id")).as("key"),
        (col("vec_id") + 1000000000L).as("vec_id"),
        reverse(col("embedding").cast("array<double>")).as("embedding"))
    def timed(label: String)(f: => Unit): Unit = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      f
      println(f"[indexscale/loop] $label: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    timed(s"build(${emb.count()})") {
      graft.api.Graft.annIndexBuild(emb, "vec_id", "embedding", dir,
        dim = dim, trainFraction = 0.1)
    }
    timed("seedIndexKeymap") {
      SI.seedIndexKeymap(spark, dir, keyed, "key", "vec_id")
    }
    timed(s"writeIndexBatch(${batch.count()} re-embeds)") {
      SI.writeIndexBatch(batch, 0L, dir, "key", "vec_id", "embedding",
        2.0, 0.0)
    }
    timed("re-delivered committed batch (marker skip)") {
      SI.writeIndexBatch(batch, 0L, dir, "key", "vec_id", "embedding",
        2.0, 0.0)
    }
    timed("marker-less retry (convergence path)") {
      val p = new org.apache.hadoop.fs.Path(s"$dir/keymap/v=1")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
      SI.writeIndexBatch(batch, 0L, dir, "key", "vec_id", "embedding",
        2.0, 0.0)
    }
    val st = graft.ext.AnnIndex.stats(spark, dir).head()
    println(s"[indexscale/loop] n_tombstoned=" +
      s"${st.getAs[Long]("n_tombstoned")} drift=" +
      s"${st.getAs[Double]("drift_fraction")}")
    // segmented-keymap write amplification (r17): the absorb writes
    // only its delta; report bytes at rest, then trigger a fold and
    // report the collapsed layout
    val fsK = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def bytes(p: String): Long =
      if (fsK.exists(new org.apache.hadoop.fs.Path(p)))
        fsK.getContentSummary(new org.apache.hadoop.fs.Path(p)).getLength
      else 0L
    println(s"[indexscale/loop] keymap at rest: seed v=0 " +
      s"${bytes(s"$dir/keymap/v=0") / 1024} KiB, delta segment v=1 " +
      s"${bytes(s"$dir/keymap/v=1") / 1024} KiB (pre-r17 wrote the " +
      "full map per batch)")
    val batch2 = emb.filter(col("vec_id") % 16 === 4)
      .select(concat(lit("k-"), col("vec_id")).as("key"),
        (col("vec_id") + 2000000000L).as("vec_id"),
        reverse(col("embedding").cast("array<double>")).as("embedding"))
    timed(s"second absorb (${batch2.count()} re-embeds) + keymap fold") {
      SI.writeIndexBatch(batch2, 1L, dir, "key", "vec_id", "embedding",
        2.0, 0.0, keymapFoldEveryBatches = 2)
    }
    println(s"[indexscale/loop] post-fold: base " +
      s"${bytes(s"$dir/keymapbase") / 1024} KiB, live segments " +
      s"${bytes(s"$dir/keymap") / 1024} KiB")
    timed("drift-policy maintain (rebuild)") {
      val ran = graft.ext.AnnIndex.maintain(spark, dir, 0.05,
        trainFraction = 0.1)
      require(ran, "the probe's drift must cross 0.05")
    }
  }

  private def addProbe(spark: SparkSession,
                       emb: org.apache.spark.sql.DataFrame,
                       dim: Int): Unit = {
    import org.apache.spark.sql.functions._
    val base = emb.filter(col("vec_id") % 100 =!= 0)
    val delta = emb.filter(col("vec_id") % 100 === 0)
      .select((col("vec_id") + 1000000000L).as("vec_id"), col("embedding"))
      .cache()
    println(s"[indexscale/add] base=${base.count()} delta=${delta.count()}")
    def timed(label: String)(f: => Unit): Unit = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      f
      println(f"[indexscale/add] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val withBloom = java.nio.file.Files
      .createTempDirectory("graft-addprobe-b").toString
    graft.api.Graft.annIndexBuild(base, "vec_id", "embedding", withBloom,
      dim = dim, trainFraction = 0.1)
    val noBloom = java.nio.file.Files
      .createTempDirectory("graft-addprobe-n").toString
    graft.api.Graft.annIndexBuild(base, "vec_id", "embedding", noBloom,
      dim = dim, trainFraction = 0.1)
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmrf)); f.delete(); ()
    }
    rmrf(new java.io.File(s"$noBloom/uidbloom"))
    // a VERSIONED index with a missing bloom now SELF-HEALS on add (r15)
    // — to measure the true pre-bloom full-semi-join fallback, strip the
    // params version stamp so the artifact reads as pre-versioning
    val legacyParams = spark.read.parquet(s"$noBloom/params")
      .drop("format_version", "n_base").collect()
    spark.createDataFrame(
        spark.sparkContext.parallelize(legacyParams.toSeq, 1),
        spark.read.parquet(s"$noBloom/params")
          .drop("format_version", "n_base").schema)
      .write.mode("overwrite").parquet(s"$noBloom/params")
    timed("fresh-uid add, WITH bloom (guard never scans the index)") {
      graft.api.Graft.annIndexAdd(spark, withBloom, delta, "vec_id",
        "embedding")
    }
    timed("fresh-uid add, NO bloom (pre-r14 full-semi-join fallback)") {
      graft.api.Graft.annIndexAdd(spark, noBloom, delta, "vec_id",
        "embedding")
    }
    // STRING-uid index (content-hash keys): the r15 hashed bloom gives
    // the same delta-sized guard the long path gets
    val baseS = base.select(md5(col("vec_id").cast("string")).as("vec_id"),
      col("embedding"))
    val deltaS = delta.select(
      concat(lit("n-"), md5(col("vec_id").cast("string"))).as("vec_id"),
      col("embedding")).cache()
    deltaS.count()
    val strDir = java.nio.file.Files
      .createTempDirectory("graft-addprobe-s").toString
    graft.api.Graft.annIndexBuild(baseS, "vec_id", "embedding", strDir,
      dim = dim, trainFraction = 0.1)
    timed("fresh-uid add, STRING uids WITH hashed bloom") {
      graft.api.Graft.annIndexAdd(spark, strDir, deltaS, "vec_id",
        "embedding")
    }
    timed("duplicate add, WITH bloom (hit -> exact confirm -> loud)") {
      try {
        graft.api.Graft.annIndexAdd(spark, withBloom, delta, "vec_id",
          "embedding")
        sys.error("duplicate add must fail")
      } catch { case e: IllegalArgumentException =>
        require(e.getMessage.contains("already exist"), e.getMessage)
      }
    }
  }
}
