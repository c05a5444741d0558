package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: time the Lloyd coarse quantizer at PRODUCTION k — the
  * SCALING.md evidence for the "grow k with the corpus" lever
  * (VERDICT r7/r8: the old k-wide column stack fell out of whole-stage
  * codegen past a few hundred centers; the `ArgMinCentroid` rewrite must
  * be shown fast AT that k, not just bit-correct).
  *
  *   QuantScale <embeddingsDir> <k> [iters] [trainFraction]
  *
  * Prints learn+assign wall (two passes — cold then warm), the assignment
  * distribution (cells, min/max population), and asserts the executed
  * assignment plan stayed inside whole-stage codegen (the `*(n)` prefix on
  * the `graft_argmin_centroid` projection — same check PhysicalSpec pins
  * at fixture scale).
  */
object QuantScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(256)
    val iters = args.lift(2).map(_.toInt).getOrElse(2)
    val frac = args.lift(3).map(_.toDouble).getOrElse(1.0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.io.Tables.embeddings(spark, dir)
    val nVec = emb.count()
    println(s"[quantscale] $nVec vectors from $dir, k=$k iters=$iters " +
      s"trainFraction=$frac")

    for (pass <- Seq("cold", "warm")) {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val bucketed = graft.ext.Similarity.kmeansBuckets(
        emb, "vec_id", "embedding", k = k, iters = iters, bucketCol = "qb",
        trainFraction = frac)
      val dist = bucketed.groupBy("qb").count()
        .agg(count(lit(1)).as("cells"), min("count").as("mn"),
          max("count").as("mx"))
        .head()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[quantscale] $pass: wall=$wall%.2f s cells=${dist.getLong(0)} " +
        s"minCell=${dist.getLong(1)} maxCell=${dist.getLong(2)}")
      if (pass == "cold") {
        // codegen audit at THIS k: the assignment projection must carry the
        // whole-stage prefix — losing it is the 64KB cliff this tool guards
        // bind ONE Dataset and inspect the plan of the probe that actually
        // ran — under AQE a fresh `bucketed.limit(1)` would expose the
        // unexecuted initial plan, not the final one (PhysicalSpec pattern)
        val probe = bucketed.limit(1)
        probe.collect()
        val plan = probe.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        val lines = plan.linesIterator
          .filter(_.contains("graft_argmin_centroid")).toSeq
        require(lines.nonEmpty, s"no argmin in plan:\n$plan")
        require(lines.forall(_.trim.matches("""^[+:\-\s]*\*\(\d+\).*""")),
          s"assignment fell out of whole-stage codegen at k=$k:\n$plan")
        println(s"[quantscale] codegen ok at k=$k " +
          s"(${lines.size} argmin projection(s), all whole-stage)")
      }
    }
    spark.stop()
  }
}
