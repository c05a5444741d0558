package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ext.Bpe

/** Dev tool: measure BPE training throughput, sequential (one job +
  * 1-row collect per merge) vs batched ([[Bpe.trainBatched]], up to B
  * symbol-disjoint merges per iteration) on a real documents directory —
  * the SCALING.md evidence for the driver-round-trip cut at production
  * vocabulary sizes.
  *
  *   BpeScale [documentsDir] [nMerges] [batch]
  *
  * Also asserts batch=1 parity: trainBatched(nIters=n, batch=1) must
  * reproduce train(n)'s merge table exactly (with batch=1 the pool rule
  * degenerates to the sequential argmax).
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf0.1x100")
    val nMerges = args.lift(1).map(_.toInt).getOrElse(32)
    val batch = args.lift(2).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.io.Tables.documents(spark, dir)
    println(s"[bpescale] ${docs.count()} docs from $dir")

    // parity gate first (tiny depth): batch=1 ≡ sequential
    val seq4 = Bpe.train(docs, "text", 4)._1
    val bat4 = Bpe.trainBatched(docs, "text", nIters = 4, batch = 1)._1
    require(seq4 == bat4,
      s"batch=1 parity broke:\n  seq: $seq4\n  bat: $bat4")
    println(s"[bpescale] batch=1 parity OK over ${seq4.size} merges")

    def timed(label: String)(f: => Seq[Bpe.Merge]): Unit = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val m = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[bpescale] $label: ${m.size} merges in $sec%.1f s " +
        f"(${m.size / sec}%.2f merges/s)")
    }
    if (!args.lift(3).contains("skipseq"))
      timed(s"sequential B=1 x$nMerges") {
        Bpe.train(docs, "text", nMerges)._1
      }
    timed(s"batched B=$batch x$nMerges") {
      Bpe.trainBatched(docs, "text",
        nIters = (nMerges + batch - 1) / batch, batch = batch)._1
    }
    spark.stop()
  }
}
