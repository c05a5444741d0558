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
    import graft.ml.Forecast
    val base = graft.queries.Parity.daily(spark, dir)
      .select(col("user_id"), col("date"), col("daily_value"))
    val feats = time("features+cache")(
      { val f = Forecast.computeFeatures(base).cache(); f.count(); f })
    val Array(minD, maxD) = feats.agg(min(col("date")), max(col("date")))
      .collect().head.toSeq.map(_.toString).toArray
    val span = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(minD), java.time.LocalDate.parse(maxD))
    val cut = java.time.LocalDate.parse(minD).plusDays(span * 7 / 10).toString
    val vcut = java.time.LocalDate.parse(minD).plusDays(span * 5 / 10).toString
    val train = feats.filter(col("date") < lit(cut)).cache()
    val test = feats.filter(col("date") >= lit(cut)).cache()
    println(s"train=${train.count()} test=${test.count()}")
    val fcols = Forecast.featureCols(feats, Seq("user_id", "date", "daily_value"))
    val lr = time("LR full grid")(
      Forecast.trainLinearRegression(train, test, fcols, "daily_value", vcut))
    println(s"lr rmse=${lr.rmse} ${lr.bestParams}")
    val rf = time("RF grid")(
      Forecast.trainRandomForest(train, test, fcols, "daily_value", vcut))
    println(s"rf rmse=${rf.rmse} ${rf.bestParams}")
    spark.stop()
  }
}
