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
}
