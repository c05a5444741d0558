package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ml.{Anomaly, Forecast}

/** Dev tool: phase-level wall breakdown of the ml_fused bench line (the
  * single largest item, 14% of the r9 run) — features build, LR grid, RF
  * grid, KMeans anomaly — plus the LR grid's ACTUAL iterations-to-
  * convergence per point (`model.summary.totalIterations`), the evidence
  * for whether the reference's `maxIter=100` ever binds. Measure, don't
  * guess: a maxIter cut is only free if no grid point comes near it.
  *
  *   MlPhases [sfDir]
  */
object MlPhases {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[mlphases] $label%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val daily = graft.queries.Parity.daily(spark, dir)
      .select(col("user_id"), col("date"), col("daily_value"))
    val feats = timed("features") {
      val f = Forecast.computeFeatures(daily).cache()
      f.count(); f
    }
    val Array(minD, maxD) = feats.agg(min(col("date")), max(col("date")))
      .collect().head.toSeq.map(_.toString).toArray
    val span = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(minD), java.time.LocalDate.parse(maxD))
    val testCutoff =
      java.time.LocalDate.parse(minD).plusDays(span * 7 / 10).toString
    val valCutoff =
      java.time.LocalDate.parse(minD).plusDays(span * 5 / 10).toString
    val train = feats.filter(col("date") < lit(testCutoff)).cache()
    val test = feats.filter(col("date") >= lit(testCutoff)).cache()
    train.count(); test.count()
    val fcols = Forecast.featureCols(feats, Seq("user_id", "date",
      "daily_value"))

    // LR-grid convergence census on the same prepped frames the grid uses
    timed("lr_iter_census") {
      val assembler = new org.apache.spark.ml.feature.VectorAssembler()
        .setInputCols(fcols).setOutputCol("features")
        .setHandleInvalid("skip")
      val scaler = new org.apache.spark.ml.feature.StandardScaler()
        .setInputCol("features").setOutputCol("scaled_features")
      val innerTrain = train.filter(col("date") < lit(valCutoff))
      val prep = new org.apache.spark.ml.Pipeline()
        .setStages(Array(assembler, scaler)).fit(innerTrain)
      val prepTrain = prep.transform(innerTrain).cache()
      prepTrain.count()
      for {
        reg <- Seq(0.01, 0.1, 1.0); en <- Seq(0.0, 0.5, 1.0)
      } {
        val m = new org.apache.spark.ml.regression.LinearRegression()
          .setFeaturesCol("scaled_features").setLabelCol("daily_value")
          .setMaxIter(100).setRegParam(reg).setElasticNetParam(en)
          .fit(prepTrain)
        println(s"[mlphases]   lr reg=$reg en=$en solver-iters=" +
          s"${m.summary.totalIterations} objHist=" +
          s"${m.summary.objectiveHistory.length}")
      }
      prepTrain.unpersist()
    }

    val lrFit = timed("lr_grid") {
      Forecast.trainLinearRegression(train, test, fcols, "daily_value",
        valCutoff)
    }
    val rfFit = timed("rf_grid") {
      Forecast.trainRandomForest(train, test, fcols, "daily_value",
        valCutoff)
    }
    // RF A/B (opt-in: `MlPhases <sfDir> ab`): result-identical scheduling
    // levers only. maxMemoryInMB controls how many tree nodes share one
    // distributed stats pass (bigger = fewer passes, same split
    // decisions); nPart trades per-fit treeAggregate parallelism against
    // task scheduling overhead. Each config runs twice (JIT warm-up +
    // measured) — order effects dominated the first cut of this A/B.
    // Measured r10 (sf0.1): 1 part 11.9 s, 4 parts 7.6 s, 8 parts 6.1 s,
    // 32 parts 7.7 s; mem=1024 6-8x SLOWER than 256 at this scale.
    val abConfigs = if (args.lift(1).contains("ab")) Seq(
        (256, false, 1), (256, false, 1),
        (256, false, 4), (256, false, 4),
        (256, false, 8), (256, false, 8),
        (256, false, 0), (256, false, 0)) else Nil
    for ((mem, cache, nPart) <- abConfigs) {
      timed(s"rf_ab mem=$mem cache=$cache np=$nPart") {
        val assembler = new org.apache.spark.ml.feature.VectorAssembler()
          .setInputCols(fcols).setOutputCol("features")
          .setHandleInvalid("skip")
        val inner0 = assembler.transform(
          train.filter(col("date") < lit(valCutoff))).cache()
        inner0.count()
        val inner = if (nPart > 0) inner0.coalesce(nPart) else inner0 // 0 = leave at source partitioning
        val grid = for {t <- Seq(50, 100); d <- Seq(5, 10)} yield (t, d)
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        val fits = Await.result(Future.sequence(grid.map { case (t, d) =>
          Future {
            new org.apache.spark.ml.regression.RandomForestRegressor()
              .setFeaturesCol("features").setLabelCol("daily_value")
              .setNumTrees(t).setMaxDepth(d).setSeed(42)
              .setMaxMemoryInMB(mem).setCacheNodeIds(cache)
              .fit(inner)
          }
        }), scala.concurrent.duration.Duration.Inf)
        println(s"[mlphases]   rf fits=${fits.size}")
        inner0.unpersist()
      }
    }

    val best = Seq(lrFit, rfFit).minBy(_.rmse)
    val preds = timed("winner_transform") {
      val p = best.model.transform(feats)
        .select(col("user_id"), col("date"), col("daily_value"),
          col("prediction"))
        .filter(col("date") >= lit(testCutoff)).cache()
      p.count(); p
    }
    timed("kmeans_anomaly") {
      Anomaly.run(graft.queries.Parity.daily(spark, dir), preds).count()
    }
    println(s"[mlphases] lr rmse=${lrFit.rmse} rf rmse=${rfFit.rmse}")
    spark.stop()
  }
}
