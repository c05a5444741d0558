package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Spread}
import graft.io.Tables

/** Dev-only: stage decomposition of prefixJaccardPairs. */
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

    // current: groupBy + join
    val dfreq = shx.groupBy(col("s")).agg(count(lit(1)).as("dft"))
    val byDoc = Window.partitionBy(col("doc_id"))
    val ranked1 = shx.join(dfreq, "s")
      .withColumn("pos", row_number().over(byDoc.orderBy(col("dft"), col("s"))))
      .withColumn("n_g", count(lit(1)).over(byDoc))
      .filter(col("pos") <= col("n_g") - ceil(lit(threshold) * col("n_g")) + 1)
      .select(col("doc_id"), col("s"))
    time("prefix via groupBy+join")(println(ranked1.count()))
    time("prefix via groupBy+join (2nd)")(println(ranked1.count()))

    // window dft
    val ranked2 = shx.withColumn("dft", count(lit(1)).over(Window.partitionBy(col("s"))))
      .withColumn("pos", row_number().over(byDoc.orderBy(col("dft"), col("s"))))
      .withColumn("n_g", count(lit(1)).over(byDoc))
      .filter(col("pos") <= col("n_g") - ceil(lit(threshold) * col("n_g")) + 1)
      .select(col("doc_id"), col("s"))
    time("prefix via window dft")(println(ranked2.count()))
    time("prefix via window dft (2nd)")(println(ranked2.count()))

    // full op stages
    val prefix = ranked1.cache()
    time("prefix materialize")(println(prefix.count()))
    val cands = prefix.withColumnRenamed("doc_id", "id_a")
      .join(prefix.withColumn("id_b", col("doc_id")).drop("doc_id"), "s")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    time("cands")(println(cands.count()))
    time("verify")(println(
      Dedup.verifyCandidatesJaccard(cands, docs, "text", "doc_id", threshold, 3).count()))
    time("full current op")(println(
      Dedup.prefixJaccardPairs(docs, "text", "doc_id", threshold).count()))
    spark.stop()
  }
}
