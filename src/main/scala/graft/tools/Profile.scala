package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.io.Tables

/** Dev-only stage profiler for the hotspot queries. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("PROFILE_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = Tables.documents(spark, dir).cache()
    println(s"docs: ${docs.count()}")

    val sh = time("shingles")(
      docs.select(col("doc_id"), Dedup.shingles(col("text")).as("g")).cache())
    println(s"shingle rows: ${sh.count()}, avg size: " +
      sh.agg(avg(size(col("g")))).head.getDouble(0))

    val sig = time("minhash signatures")(
      Dedup.minHashSignatures(docs, "text", "doc_id").cache())
    sig.count()

    val banded = sig.select(col("doc_id"),
        explode(sequence(lit(0), lit(3))).as("band"), col("sig"))
      .select(col("doc_id"), xxhash64(col("band"),
        slice(col("sig"), col("band") * 4 + 1, lit(4))).as("band_key"))
    val cands = banded.withColumnRenamed("doc_id", "id_a")
      .join(banded.withColumnRenamed("doc_id", "id_b"), Seq("band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct().cache()
    time("candidate pairs")(println(s"cands: ${cands.count()}"))

    time("full minHashLsh")(
      println("lsh rows: " + Dedup.minHashLsh(docs, "text", "doc_id").count()))
    if (sys.env.contains("PROFILE_EXPLAIN"))
      Dedup.minHashLsh(docs, "text", "doc_id").explain("formatted")

    time("full ngramJaccard")(println("ngram rows: " +
      Dedup.ngramJaccardPairs(
        docs.withColumn("len_band", expr("n_chars div 50")),
        "text", "doc_id", Seq("lang", "len_band"), 0.05).count()))

    time("simHashes only")(
      println("simhash rows: " + Dedup.simHashes(docs, "text", "doc_id").count()))
    time("full simHashNearDups")(
      println("simhash pairs: " + Dedup.simHashNearDups(
        docs, "text", "doc_id", Seq("lang"), 3).count()))

    val ta = graft.ext.TextAnalysis
    time("text stats")(println("stats rows: " +
      ta.withTokenStats(docs, "text").agg(sum("n_tokens")).head.getLong(0)))

    if (sys.env.contains("PROFILE_ML"))
      time("q_ml_anomaly")(println("anomaly rows: " +
        graft.SparkEntry.queries("q_ml_anomaly")(spark, dir).count()))

    spark.stop()
  }
}
