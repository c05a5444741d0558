package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only ad-hoc timing harness: time any named SparkEntry query at a
  * given SF dir (`TimeIt <queryName> [sfDir]`), twice — cold then warm.
  */
object TimeIt {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_hourly_agg")
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time(s"$name cold")(
      println(graft.SparkEntry.queries(name)(spark, dir).count()))
    time(s"$name warm")(
      println(graft.SparkEntry.queries(name)(spark, dir).count()))
    spark.stop()
  }
}
