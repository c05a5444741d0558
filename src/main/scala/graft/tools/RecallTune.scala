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
}
