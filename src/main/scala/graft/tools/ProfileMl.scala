package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ml.{Anomaly, Forecast}
import graft.queries.Parity

object ProfileMl {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ml] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val daily = Parity.daily(spark, dir)
    time("daily count")(println(daily.count()))
    val feats = time("features materialize")(
      { val f = Forecast.computeFeatures(daily).cache(); f.count(); f })
    time("forecast run (incl features again)")(
      Forecast.run(Parity.daily(spark, dir))._1.count())
    val preds = Forecast.run(Parity.daily(spark, dir))._1
    time("anomaly run")(
      Anomaly.run(Parity.daily(spark, dir), preds).count())
    spark.stop()
  }
}
