package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: A/B the SQ8 encode spellings over a real embeddings
  * directory — the measured basis for the [[graft.functions.Sq8Encode]]
  * claim that the interpreted `zip_with` encode was scan-dominating
  * (encode touches EVERY corpus vector; at 100 TB it is the scan).
  *
  *   EncodeBench [embeddingsDir]
  *
  * Times a full count over the encoded column, legacy interpreted
  * `zip_with(zip_with(...))` vs the codegen'd `graft_sq8_encode`, two
  * passes each (cold then warm) with a shared codebook, plus a checksum
  * agreement assertion so the comparison can't silently diverge.
  */
object EncodeBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/emb100")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.io.Tables.embeddings(spark, dir)
    val vd = col("embedding").cast("array<double>")
    val stats = emb.select(posexplode(vd).as(Seq("i", "x")))
      .groupBy(col("i")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    val mn = stats.map(_._2)
    val span = stats.map { case (_, lo, hi) => hi - lo }
    println(s"[encbench] ${emb.count()} vectors, dim=${mn.length} from $dir")

    val legacy = zip_with(zip_with(vd, typedLit(mn.toSeq), (x, m) => x - m),
      typedLit(span.toSeq),
      (d, s) => when(s > 0, round(d * lit(255.0) / s)).otherwise(lit(0.0))
        .cast("int"))
    val native = graft.functions.Sq8Functions.graft_sq8_encode(vd, mn, span)

    // checksum: identical code streams (order-independent sum of codes)
    def codeSum(c: org.apache.spark.sql.Column): Long =
      emb.select(aggregate(c, lit(0L), (a, x) => a + coalesce(x, lit(0)))
        .as("s")).agg(sum("s")).head.getLong(0)
    val (sl, sn) = (codeSum(legacy), codeSum(native))
    require(sl == sn, s"encode checksum mismatch: legacy $sl vs native $sn")

    for (pass <- Seq("cold", "warm"); (label, c) <- Seq(
        "legacy_zipwith" -> legacy, "graft_sq8_encode" -> native)) {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      // consume through hash(code) (codegen'd, touches every element, no
      // interpreted consumer masking the A/B) aggregated to one long
      val n = emb.select(hash(c).as("h")).agg(sum(col("h"))).head.getLong(0)
      println(f"[encbench] $pass $label: ${(System.nanoTime() - t0) / 1e9}%.2f s (agg=$n)")
    }
    spark.stop()
  }
}
