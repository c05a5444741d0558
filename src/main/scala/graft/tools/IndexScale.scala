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
    timed("fresh-uid add, WITH bloom (guard never scans the index)") {
      graft.api.Graft.annIndexAdd(spark, withBloom, delta, "vec_id",
        "embedding")
    }
    timed("fresh-uid add, NO bloom (pre-r14 full-semi-join fallback)") {
      graft.api.Graft.annIndexAdd(spark, noBloom, delta, "vec_id",
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
