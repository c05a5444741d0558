package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only ad-hoc timing harness (scratch; contents change per hotspot). */
object TimeIt {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val dir = "/root/testdata/sf0.1"
    val daily = graft.queries.Parity.daily(spark, dir)
    val base = daily.select(col("user_id"), col("date"), col("daily_value"))
    val preds = time("Forecast.run full")(graft.ml.Forecast.run(base)._1)
    time("Anomaly.run")(println(graft.ml.Anomaly.run(daily, preds).count()))
    time("Anomaly.run again")(println(graft.ml.Anomaly.run(daily, preds).count()))
    spark.stop()
  }
}
