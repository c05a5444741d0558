package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only ad-hoc timing harness (scratch; contents change per hotspot). */
object TimeIt {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val dir = "/root/testdata/sf0.1"
    graft.SparkEntry.queries("q_simhash_pairs")(spark, dir).count() // warm
    time("q_dedup_clusters warm")(
      println(graft.SparkEntry.queries("q_dedup_clusters")(spark, dir).count()))
    spark.stop()
  }
}
