package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: [[graft.api.Graft.withIngestIds]] at corpus scale — the
  * SCALING.md evidence that the re-id helper itself holds up (it is the
  * new prefix of every arbitrary-keyed incremental run). Measures the
  * full-corpus re-id and the nightly-delta shape, and asserts the id
  * contract (dense, unique, partitioning-invariant) at scale.
  *
  *   IngestIdScale [docsDir] [deltaRows]
  */
object IngestIdScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sg100")
    val deltaRows = args.lift(1).map(_.toInt).getOrElse(5000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val keyed = graft.io.Tables.documents(spark, dir)
      .withColumn("ukey",
        concat(lit("u-"), reverse(col("doc_id").cast("string"))))
      .drop("doc_id")
    val n = keyed.count()
    println(s"[ingestscale] $n docs from $dir")
    def run(label: String, df: org.apache.spark.sql.DataFrame,
            base: Long): Long = {
      val t0 = System.nanoTime()
      val (reId, next) = graft.api.Graft.withIngestIds(df, "ukey",
        base = base)
      val stats = reId.agg(count(lit(1)).as("n"),
        countDistinct(col("ingest_id")).as("d"),
        min(col("ingest_id")).as("lo"), max(col("ingest_id")).as("hi"))
        .head()
      val wall = (System.nanoTime() - t0) / 1e9
      assert(stats.getAs[Long]("n") == stats.getAs[Long]("d") &&
        stats.getAs[Long]("lo") == base + 1 &&
        stats.getAs[Long]("hi") == next,
        s"id contract violated at scale: $stats next=$next")
      println(f"[ingestscale] $label: ${stats.getAs[Long]("n")} rows " +
        f"re-id'd in $wall%.2f s (ids dense in (${base}, $next])")
      next
    }
    val next = run("full corpus", keyed, 0L)
    // the nightly shape: a bounded delta continuing from the stored base
    val delta = keyed.orderBy(col("ukey")).limit(deltaRows)
      .withColumn("ukey", concat(lit("d2-"), col("ukey")))
    run(s"delta($deltaRows)", delta, next)
    spark.stop()
  }
}
