package graft.tools

import org.apache.spark.sql.SparkSession

import graft.api.Graft

/** Dev tool: measure the FIRST-RUN corpus build (tokenizer training
  * included) under each [[Graft.BpeTrainer]] on a real documents
  * directory — the SCALING.md evidence that the batched trainer removes
  * the sequential-BPE bottleneck from `corpusBuildTrained`'s first run
  * (round 11 measured 162.3 s of a 100×-corpus first run as sequential
  * training).
  *
  *   CorpusBuildScale [documentsDir] [nMerges] [batch] [skipseq]
  */
object CorpusBuildScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf0.1x100")
    val nMerges = args.lift(1).map(_.toInt).getOrElse(8)
    val batch = args.lift(2).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.io.Tables.documents(spark, dir)
    println(s"[cbscale] ${docs.count()} docs from $dir, nMerges=$nMerges")

    def timed(label: String)(f: => Long): Unit = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[cbscale] $label: $rows rows in $sec%.1f s")
    }
    if (!args.lift(3).contains("skipseq"))
      timed(s"first run, Sequential x$nMerges") {
        Graft.corpusBuildTrained(docs, "text", "doc_id", "lang",
          nMerges = nMerges, trainer = Graft.BpeTrainer.Sequential,
          minTokens = 10).count()
      }
    timed(s"first run, Batched($batch) x$nMerges") {
      Graft.corpusBuildTrained(docs, "text", "doc_id", "lang",
        nMerges = nMerges, trainer = Graft.BpeTrainer.Batched(batch),
        minTokens = 10).count()
    }
    spark.stop()
  }
}
