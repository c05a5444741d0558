package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.Graft
import graft.ext.{Sampling, Similarity}

/** Dev tool: the recall-monitor output turned into a tuning loop — sweep
  * the residual IVF-PQ code budget `m` and probe width `nProbe` over the
  * same deterministic hash-sampled query panel `q_ann_recall` monitors,
  * against exact brute-force ground truth. The SCALING.md
  * recall-vs-(m, nProbe) table and the facade-default justification come
  * from this run.
  *
  *   RecallTune [embeddingsDir] [dim] [panelPct]
  *   RecallTune [embeddingsDir] [dim] [panelPct] add   # staleness sweep
  *
  * `add` mode measures [[graft.ext.AnnIndex.add]] STALENESS instead: a
  * persisted index builds on a third of the corpus, the rest arrives as
  * frozen-geometry add() batches at cumulative 10/50/100/200% of the
  * build size, and recall@5 (vs exact ground truth over the GROWN set)
  * is measured after each — plus the rebuilt-at-200% reference, the gap
  * to which is the price of never retraining. The SCALING.md
  * recall-vs-added-fraction curve and `maxAddedFraction`'s default come
  * from this run.
  *
  * Also prints the IVF-SQ8 reference point (byte-per-dimension codes) so
  * the PQ budgets read against the bigger-code alternative.
  */
object RecallTune {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val panelPct = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.lift(3).contains("add")) { addSweep(spark, dir, dim, panelPct); spark.stop(); return }
    if (args.lift(3).contains("churn")) {
      churnSweep(spark, dir, dim, panelPct,
        args.lift(4).map(_.toInt).getOrElse(8))
      spark.stop(); return
    }
    val emb = graft.io.Tables.embeddings(spark, dir)
    val panel = Sampling.deterministicSample(emb, "vec_id", "recall",
        panelPct)
      .select(col("vec_id"), col("embedding"))
    println(s"[recalltune] ${emb.count()} vectors, panel=${panel.count()} " +
      s"from $dir")
    val exact = Similarity.bruteForceTopK(panel, emb, "vec_id", "embedding",
        k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def recallOf(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val a = df
        .join(panel.select(col("vec_id").as("query_id")), Seq("query_id"),
          "left_semi")
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val wall = (System.nanoTime() - t0) / 1e9
      (a.intersect(exact).size.toDouble / exact.size, wall)
    }

    for (m <- Seq(4, 8, 16); nProbe <- Seq(1, 2, 4)) {
      val (r, w) = recallOf(Graft.annTopKIvfPqRes(emb, "vec_id",
        "embedding", k = 5, dim = dim, nProbe = nProbe, m = m))
      val bytes = m * 4 / 8 // kSub=16 -> 4 bits per code
      println(f"[recalltune] ivfpq_res m=$m%2d ($bytes%2d B) " +
        f"nProbe=$nProbe: recall@5=$r%.3f wall=$w%.1f s")
    }
    for (nProbe <- Seq(1, 2, 4)) {
      val (r, w) = recallOf(Graft.annTopKIvfSq8(emb, "vec_id", "embedding",
        k = 5, nProbe = nProbe))
      println(f"[recalltune] ivf_sq8  ($dim B) nProbe=$nProbe: " +
        f"recall@5=$r%.3f wall=$w%.1f s")
    }
    spark.stop()
  }

  /** A deterministic CLUSTERED corpus (the ExtSpec sin-cluster recipe
    * at probe scale): `nClusters` well-separated centers × `perCluster`
    * rows of 5% sinusoidal noise. The churn probe's r18 run sat at the
    * testdata embeddings' ~0.05 recall floor (uniform vectors — every
    * neighbor is equally far), where a real geometry regression hides
    * inside noise (VERDICT r18 #6); this fixture puts the same
    * lifecycle in the ~0.9 regime the `ivfSq8TopK` specs pin, where a
    * gap is statistically visible. RNG-free by construction.
    */
  private def clusteredCorpus(spark: SparkSession, dim: Int,
                              nClusters: Int, perCluster: Int)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val rows = for {
      c <- 0 until nClusters
      j <- 0 until perCluster
    } yield {
      val base = Array.tabulate(dim)(d =>
        math.sin((d + 1) * (c + 1) * 0.7391))
      val noise = Array.tabulate(dim)(d =>
        0.05 * math.sin((d + 1) * (c * 100 + j + 7) * 1.234))
      (c.toLong * perCluster + j,
        base.zip(noise).map { case (b, n) => b + n })
    }
    rows.toDF("vec_id", "embedding").repartition(32)
  }

  /** `churn` mode (r18, VERDICT r17 #6): recall under the MAINTAINED
    * latest-wins lifecycle — N supersede+add cycles (each re-embedding a
    * deterministic 1/N slice of the corpus under shifted uids and a mild
    * 0.9·v + 0.1·reverse(v) drift) with [[graft.ext.AnnIndex.maintain]]
    * on the loop's cadence, recall@5 measured against exact ground truth
    * over the CURRENT live set after every cycle, plus the fresh-build
    * reference over the terminal live set. Between rebuilds the served
    * geometry is frozen (supersede only retires), so this measures
    * exactly what the drift threshold's implied bound claims: recall
    * sags between maintains and recovers at each rebuild; the terminal
    * gap to the fresh build is the churn price the threshold tolerates.
    * Pass `clustered` as the dir for the high-recall regime
    * ([[clusteredCorpus]], r19 — run it at `dim` 32).
    */
  private def churnSweep(spark: SparkSession, dir: String, dim: Int,
                         panelPct: Int, cycles: Int): Unit = {
    val emb = (if (dir == "clustered")
        clusteredCorpus(spark, dim, nClusters = 50, perCluster = 400)
      else graft.io.Tables.embeddings(spark, dir))
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding").cast("array<double>")
        .as("embedding"))
      .cache()
    val n = emb.count()
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-churn").toString
    Graft.annIndexBuild(emb, "vec_id", "embedding", idxDir, dim = dim,
      m = 8, trainFraction = 0.1)
    println(s"[churn] base=$n cycles=$cycles maintain@drift>=0.3 from $dir")

    def measure(current: org.apache.spark.sql.DataFrame, label: String,
                searchDir: String): Double = {
      val panel = Sampling.deterministicSample(current, "vec_id",
        "recall", panelPct).select(col("vec_id"), col("embedding"))
      val exact = Similarity.bruteForceTopK(panel, current, "vec_id",
          "embedding", k = 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = graft.ext.AnnIndex.search(spark, searchDir, panel,
          "vec_id", "embedding", k = 5, nProbe = 2, maxBucket = 4096)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val rec = got.intersect(exact).size.toDouble / exact.size
      println(f"[churn] $label%-22s recall@5=$rec%.3f")
      rec
    }

    measure(emb, "cycle=0", idxDir)
    var current = emb
    for (c <- 1 to cycles) {
      // any live row may be re-embedded again in a later cycle; the
      // +1e8·c shift keeps every generation's uids disjoint (cumulative
      // shifts strictly increase per natural row, so a uid never reuses
      // a tombstoned one — the add dup-guard would refuse)
      val slice = current.filter(col("vec_id") % cycles === (c - 1))
      val reembeds = slice.select(
        (col("vec_id") + 100000000L * c).as("vec_id"),
        zip_with(col("embedding"), reverse(col("embedding")),
          (a, b) => a * 0.9 + b * 0.1).as("embedding"))
      Graft.annIndexAdd(spark, idxDir, reembeds, "vec_id", "embedding",
        maxAddedFraction = 4.0)
      Graft.annIndexSupersede(spark, idxDir,
        slice.select(col("vec_id")), "vec_id")
      val rebuilt = graft.ext.AnnIndex.maintain(spark, idxDir,
        maxDriftFraction = 0.3, trainFraction = 0.1)
      current = current
        .join(slice.select(col("vec_id")), Seq("vec_id"), "left_anti")
        .unionByName(reembeds)
        .localCheckpoint(true)
      measure(current, s"cycle=$c rebuilt=$rebuilt", idxDir)
    }
    val freshDir = java.nio.file.Files
      .createTempDirectory("graft-churn-fresh").toString
    Graft.annIndexBuild(current, "vec_id", "embedding", freshDir,
      dim = dim, m = 8, trainFraction = 0.1)
    measure(current, "fresh-build reference", freshDir)
    // the UNIT-normalized fresh reference (r19): rebuild re-learns over
    // the index's STORED unit vectors, while annIndexBuild clusters the
    // raw input — on a norm-varying corpus those geometries differ, and
    // this second reference separates "maintained lifecycle degraded"
    // from "the two build paths cluster different geometry"
    val freshUnitDir = java.nio.file.Files
      .createTempDirectory("graft-churn-freshu").toString
    Graft.annIndexBuild(
      current.select(col("vec_id"),
        graft.ext.Similarity.unitVec(col("embedding")).as("embedding")),
      "vec_id", "embedding", freshUnitDir, dim = dim, m = 8,
      trainFraction = 0.1)
    measure(current, "fresh UNIT reference", freshUnitDir)
  }

  /** The add()-staleness sweep: recall@5 of a frozen-geometry index as
    * frozen add() batches grow it to +10/50/100/200% of its build size,
    * each step measured against exact ground truth over the grown set,
    * plus the rebuild-at-+200% upper bound.
    */
  private def addSweep(spark: SparkSession, dir: String, dim: Int,
                       panelPct: Int): Unit = {
    val emb = graft.io.Tables.embeddings(spark, dir)
      .filter(col("embedding").isNotNull)
      .cache()
    val base = emb.filter(col("vec_id") % 3 === 0)
    val pool = emb.filter(col("vec_id") % 3 =!= 0)
      .withColumn("__r", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))))
      .cache() // dev tool: the single-partition rank is fine on a fixture
    val nb = base.count()
    println(s"[addsweep] base=$nb pool=${pool.count()} from $dir")
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-addsweep").toString
    Graft.annIndexBuild(base, "vec_id", "embedding", idxDir, dim = dim,
      m = 8)

    def measure(current: org.apache.spark.sql.DataFrame,
                label: String,
                searchDir: String): Unit = {
      val panel = Sampling.deterministicSample(current, "vec_id", "recall",
        panelPct).select(col("vec_id"), col("embedding"))
      val exact = Similarity.bruteForceTopK(panel, current, "vec_id",
          "embedding", k = 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = graft.ext.AnnIndex.search(spark, searchDir, panel,
          "vec_id", "embedding", k = 5, nProbe = 2, maxBucket = 4096)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val rec = got.intersect(exact).size.toDouble / exact.size
      println(f"[addsweep] $label%-14s recall@5=$rec%.3f " +
        f"(panel=${panel.count()})")
    }

    measure(base, "added=0%", idxDir)
    // cumulative 10/50/100/200% of the build size, in pool-rank order
    val cuts = Seq(0.10, 0.50, 1.00, 2.00).map(f => math.round(f * nb))
    var prev = 0L
    var current = base.select(col("vec_id"), col("embedding"))
    for (cut <- cuts) {
      val batch = pool.filter(col("__r") > prev && col("__r") <= cut)
        .select(col("vec_id"), col("embedding"))
      Graft.annIndexAdd(spark, idxDir, batch, "vec_id", "embedding",
        maxAddedFraction = 2.0)
      current = current.unionByName(batch).cache()
      prev = cut
      measure(current, s"added=${math.round(100.0 * cut / nb)}%", idxDir)
    }
    // the rebuild reference: same grown corpus, geometry retrained
    val rebuiltDir = java.nio.file.Files
      .createTempDirectory("graft-addsweep-rebuilt").toString
    Graft.annIndexBuild(current, "vec_id", "embedding", rebuiltDir,
      dim = dim, m = 8)
    measure(current, "rebuilt@200%", rebuiltDir)
    // DRIFTED adds — the case staleness is actually about: the added
    // vectors come from a DIFFERENT distribution (dimension-reversed
    // corpus vectors — same norms, different geometry), so the frozen
    // cells/books no longer describe them; the gap to the drifted
    // rebuild is the true never-retrain price under distribution shift
    val driftDir = java.nio.file.Files
      .createTempDirectory("graft-addsweep-drift").toString
    Graft.annIndexBuild(base, "vec_id", "embedding", driftDir, dim = dim,
      m = 8)
    val drifted = pool.filter(col("__r") <= 2 * nb)
      .select((col("vec_id") + 10000000L).as("vec_id"),
        reverse(col("embedding")).as("embedding"))
      .cache()
    Graft.annIndexAdd(spark, driftDir, drifted, "vec_id", "embedding",
      maxAddedFraction = 2.0)
    val grownDrift = base.select(col("vec_id"), col("embedding"))
      .unionByName(drifted).cache()
    measure(grownDrift, "drift+200%", driftDir)
    val driftRebuilt = java.nio.file.Files
      .createTempDirectory("graft-addsweep-driftrb").toString
    Graft.annIndexBuild(grownDrift, "vec_id", "embedding", driftRebuilt,
      dim = dim, m = 8)
    measure(grownDrift, "driftrebuilt", driftRebuilt)
  }
}
