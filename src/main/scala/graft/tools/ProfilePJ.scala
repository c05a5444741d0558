package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Spread}
import graft.io.Tables

/** Dev-only: stage decomposition of the SHIPPED prefixJaccardPairs pipeline
  * (window dft → prefix with (pos, n_g) → PPJoin length+positional filters
  * → exact verify), mirroring Dedup.prefixJaccardPairs stage for stage.
  */
object ProfilePJ {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pj] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val threshold = 0.5
    val docs = Tables.documents(spark, dir)
    // warm
    docs.count(); Spread.cpu(docs, "doc_id").select(col("doc_id"),
      explode(Dedup.shingles(col("text"), 3)).as("s")).count()

    val shx = Spread.cpu(docs, "doc_id").select(col("doc_id"),
      explode(Dedup.shingles(col("text"), 3)).as("s"))
    time("shx count")(println(shx.count()))

    // r17-r19 shipped form: dft via count over Window.partitionBy(s) —
    // kept here for the r20 A/B record against the agg+join form below
    val byDoc = Window.partitionBy(col("doc_id"))
    val prefixWindowForm = shx
      .withColumn("dft", count(lit(1)).over(Window.partitionBy(col("s"))))
      .withColumn("pos",
        row_number().over(byDoc.orderBy(col("dft"), col("s"))))
      .withColumn("n_g", count(lit(1)).over(byDoc))
      .filter(col("pos") <=
        col("n_g") - ceil(lit(threshold) * col("n_g") - 1e-9) + 1)
      .select(col("doc_id"), col("s"), col("pos"), col("n_g"))
    time("prefix (window-dft form)")(println(
      prefixWindowForm.write.format("noop").mode("overwrite").save()))
    // r20 shipped form: dft pre-aggregate joined back (Dedup mirror)
    val prefix = shx
      .join(shx.groupBy(col("s")).agg(count(lit(1)).as("dft")), "s")
      .withColumn("pos",
        row_number().over(byDoc.orderBy(col("dft"), col("s"))))
      .withColumn("n_g", count(lit(1)).over(byDoc))
      .filter(col("pos") <=
        col("n_g") - ceil(lit(threshold) * col("n_g") - 1e-9) + 1)
      .select(col("doc_id"), col("s"), col("pos"), col("n_g"))
      .cache()
    time("prefix (agg-dft form) materialize")(println(prefix.count()))

    val alpha = threshold / (1.0 + threshold)
    val raw = prefix.select(col("doc_id").as("id_a"), col("s"),
        col("pos").as("pos_a"), col("n_g").as("na"))
      .join(prefix.select(col("doc_id").as("id_b"), col("s"),
        col("pos").as("pos_b"), col("n_g").as("nb")), "s")
      .filter(col("id_a") < col("id_b"))
    time("raw prefix collisions")(println(raw.count()))
    val cands = raw
      .filter(least(col("na"), col("nb")) >=
        ceil(lit(threshold) * greatest(col("na"), col("nb")) - 1e-9))
      .filter(lit(1) + least(col("na") - col("pos_a"), col("nb") - col("pos_b")) >=
        ceil(lit(alpha) * (col("na") + col("nb")) - 1e-9))
      .select("id_a", "id_b").distinct()
    time("cands after PPJoin filters")(println(cands.count()))
    // shipped verify path: the precomputed shingle-set frame, not a
    // re-shingling pass over raw text
    val shSets = Spread.cpu(docs, "doc_id")
      .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("g")).cache()
    shSets.count()
    time("verify")(println(
      Dedup.verifyCandidatesJaccardSets(cands, shSets, "doc_id", threshold)
        .count()))
    time("full current op")(println(
      Dedup.prefixJaccardPairs(docs, "text", "doc_id", threshold).count()))
    spark.stop()
  }
}
