package graft

import org.apache.spark.sql.functions._

import graft.ml.{Anomaly, Forecast}
import graft.queries.Parity

/** Seeded ML invariants (SURVEY.md §5.4): metric ranges and determinism,
  * never float hash-equality.
  */
class MlSpec extends SparkSpec {

  private lazy val daily = Parity.daily(spark, TestSpark.sf0001).cache()

  test("forecast features: warm-up rows dropped, no nulls remain") {
    val f = Forecast.computeFeatures(daily)
    assert(f.count() > 0)
    val anyNull = f.columns.map(c => col(c).isNull).reduce(_ || _)
    assert(f.filter(anyNull).count() == 0)
  }

  test("P12: tariff features default when absent, one-hot when present") {
    import spark.implicits._
    // absent → lit defaults, uniform schema
    val f = Forecast.computeFeatures(daily)
    assert(Seq("tariff_high", "tariff_low", "tariff_normal")
      .forall(f.columns.contains))
    val r = f.select("tariff_high", "tariff_low", "tariff_normal").distinct()
      .collect()
    assert(r.length == 1 && r.head.toSeq == Seq(0, 0, 1))
    // present → real one-hots
    val withT = Seq((1L, "High"), (2L, "Low"), (3L, "Normal"))
      .toDF("id", "tariff")
    val oh = Forecast.withTariffFeatures(withT)
      .orderBy("id")
      .select("tariff_high", "tariff_low", "tariff_normal").collect()
    assert(oh.map(_.toSeq).toSeq ==
      Seq(Seq(1, 0, 0), Seq(0, 1, 0), Seq(0, 0, 1)))
    // generic withDefaults never overwrites an existing column
    val kept = graft.feat.Windows.withDefaults(
      Seq((1, 5)).toDF("a", "tariff_high"), Seq("tariff_high" -> lit(0)))
    assert(kept.head.getInt(1) == 5)
  }

  test("LR forecast: predictions exist, metrics finite, chronological split") {
    val (preds, fit) = Forecast.run(daily, fastGrid = true)
    assert(preds.count() > 0)
    assert(!fit.rmse.isNaN && fit.rmse >= 0 && !fit.mae.isNaN && fit.mae >= 0)
    assert(fit.r2 <= 1.0)
    // test rows must all be after the train cutoff — no temporal leakage
    val f = Forecast.computeFeatures(daily)
    val maxTrainDate = f.agg(min(col("date")), max(col("date"))).head
    assert(preds.agg(min(col("date"))).head.getDate(0)
      .after(maxTrainDate.getDate(0)))
  }

  test("RF forecast: small grid trains and ranks importances") {
    // features start ~Jan 15 at sf0.001 (lag_14 warm-up dropped by na.drop)
    val f = Forecast.computeFeatures(daily).cache()
    val cut = "2024-01-27"
    val train = f.filter(col("date") < lit(cut))
    val test = f.filter(col("date") >= lit(cut))
    val fcols = Forecast.featureCols(f, Seq("user_id", "date", "daily_value"))
    val fit = Forecast.trainRandomForest(train, test, fcols, "daily_value",
      valCutoff = "2024-01-24", grid = Seq((10, 4)))
    assert(!fit.rmse.isNaN)
    val imp = Forecast.featureImportances(fit.model, fcols, k = 5)
    assert(imp.length == 5 && imp.head._2 >= imp.last._2)
    f.unpersist()
  }

  test("anomaly: clusters in range, rate bounded, deterministic with seed") {
    val (preds, _) = Forecast.run(daily, fastGrid = true)
    val out = Anomaly.run(daily, preds).cache()
    val n = out.count()
    assert(n > 0)
    val clusters = out.select("cluster").distinct().collect()
      .map(_.getInt(0)).toSet
    assert(clusters.subsetOf((0 until 5).toSet))
    val rate = out.agg(avg(col("is_anomaly"))).head.getDouble(0)
    assert(rate >= 0 && rate < 0.2) // z>3 flags are rare by construction
    // seeded determinism: same flag count across two runs
    val out2 = Anomaly.run(daily, preds)
    assert(out2.agg(sum(col("is_anomaly"))).head.getLong(0) ==
      out.agg(sum(col("is_anomaly"))).head.getLong(0))
    out.unpersist()
  }

  test("GBT (M6, flag-enabled) and error quantiles (M13)") {
    val f = Forecast.computeFeatures(daily).cache()
    val train = f.filter(col("date") < lit("2024-01-27"))
    val test = f.filter(col("date") >= lit("2024-01-27"))
    val fcols = Forecast.featureCols(f, Seq("user_id", "date", "daily_value"))
    val fit = Forecast.trainGbt(train, test, fcols, "daily_value", maxIter = 3)
    assert(!fit.rmse.isNaN)
    val preds = fit.model.transform(test)
    val qs = Forecast.errorQuantiles(preds, "daily_value", nQuantiles = 10)
    assert(qs.length == 9 && qs.sorted.sameElements(qs)) // monotone quantiles
    f.unpersist()
  }

  test("sampled re-clustering (M12) is seeded and bounded") {
    val out = Anomaly.reclusterSample(daily,
      Array("daily_value", "num_readings"), k = 3, sampleFraction = 0.5)
    assert(out.count() > 0 && out.count() < daily.count())
    val clusters = out.select("cluster").distinct().count()
    assert(clusters <= 3)
    val again = Anomaly.reclusterSample(daily,
      Array("daily_value", "num_readings"), k = 3, sampleFraction = 0.5)
    assert(again.count() == out.count()) // same seed, same sample
  }

  test("model save/load roundtrip (S13)") {
    val (_, fit) = Forecast.run(daily, fastGrid = true)
    val dir = java.nio.file.Files.createTempDirectory("graft-model").toString
    fit.model.write.overwrite().save(dir)
    val loaded = org.apache.spark.ml.PipelineModel.load(dir)
    assert(loaded.stages.length == fit.model.stages.length)
  }

  test("M11: cross-model selection picks min test RMSE, persists winner") {
    val dir = java.nio.file.Files.createTempDirectory("graft-best").toString
    val (preds, fit) = Forecast.run(daily, modelDir = Some(dir))
    assert(preds.count() > 0)
    // the winner is named, and its rmse is the min over both candidates:
    // re-derive each candidate's test rmse independently
    assert(fit.bestParams.startsWith("model="))
    val f = Forecast.computeFeatures(daily).cache()
    val Array(minD, maxD) = f.agg(min(col("date")), max(col("date")))
      .collect().head.toSeq.map(_.toString).toArray
    val span = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(minD), java.time.LocalDate.parse(maxD))
    val cut = java.time.LocalDate.parse(minD).plusDays(span * 7 / 10).toString
    val vcut = java.time.LocalDate.parse(minD).plusDays(span * 5 / 10).toString
    val train = f.filter(col("date") < lit(cut))
    val test = f.filter(col("date") >= lit(cut))
    val fcols = Forecast.featureCols(f, Seq("user_id", "date", "daily_value"))
    val lr = Forecast.trainLinearRegression(train, test, fcols,
      "daily_value", vcut)
    val rf = Forecast.trainRandomForest(train, test, fcols,
      "daily_value", vcut)
    assert(math.abs(fit.rmse - math.min(lr.rmse, rf.rmse)) < 1e-6)
    val expectName =
      if (lr.rmse <= rf.rmse) "LinearRegression" else "RandomForest"
    assert(fit.bestParams.startsWith(s"model=$expectName,"))
    f.unpersist()
    // persistence: saved winner loads; metadata names it
    val loaded = org.apache.spark.ml.PipelineModel.load(
      s"$dir/best_forecasting_model")
    assert(loaded.stages.length == fit.model.stages.length)
    val meta = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/model_metadata.txt")))
    assert(meta.contains(s"Best Model: $expectName"))
    assert(meta.contains("RMSE:"))
  }

  test("CentroidDist: bit-equal to sqrt(Vectors.sqdist), dense and sparse") {
    import spark.implicits._
    import org.apache.spark.ml.linalg.{Vector, Vectors}
    val centers = Array(
      Array(0.5, -1.25, 3.0, 0.0),
      Array(2.0, 2.0, -0.75, 1.5),
      Array(-3.5, 0.1, 0.0, 4.25))
    val vecs: Seq[(Int, Vector, Int)] = Seq(
      (0, Vectors.dense(1.1, -2.2, 3.3, 0.4), 0),
      (1, Vectors.dense(0.0, 0.0, 0.0, 0.0), 2),
      (2, Vectors.sparse(4, Array(1, 3), Array(-2.5, 7.0)), 1),
      (3, Vectors.sparse(4, Array(), Array()), 0),
      (4, Vectors.dense(5.0, 5.0, 5.0, 5.0), 99)) // out-of-range -> null
    val df = vecs.toDF("id", "v", "c")
    val got = df.select(col("id"),
      graft.functions.CentroidFunctions.graft_centroid_dist(
        col("v"), col("c"), centers).as("d"))
      .orderBy("id").collect()
    vecs.foreach { case (id, v, c) =>
      val row = got(id)
      if (c >= centers.length) assert(row.isNullAt(1), s"id=$id want null")
      else {
        val want = math.sqrt(Vectors.sqdist(v, Vectors.dense(centers(c))))
        // bit-equality, not tolerance: same additions in the same order
        assert(java.lang.Double.doubleToLongBits(row.getDouble(1)) ==
          java.lang.Double.doubleToLongBits(want),
          s"id=$id got ${row.getDouble(1)} want $want")
      }
    }
    // null vector / null cluster -> null (nullSafeEval path)
    val nulls = Seq((Option.empty[Vector], Option(0)),
      (Option(Vectors.dense(1.0, 2.0, 3.0, 4.0)), Option.empty[Int]))
      .toDF("v", "c")
      .select(graft.functions.CentroidFunctions.graft_centroid_dist(
        col("v"), col("c"), centers).as("d"))
      .collect()
    assert(nulls.forall(_.isNullAt(0)))
  }

  test("anomaly distance is the codegen'd CentroidDist, not a ScalaUDF") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    // walk INCLUDING cached subplans — the distance column is computed
    // inside the cached withDist frame, invisible from the top plan
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => q +: walk(q.plan)
      case i: InMemoryTableScanExec => i +: walk(i.relation.cachedPlan)
      case other => other +: other.children.flatMap(walk)
    }
    val (preds, _) = Forecast.run(daily, fastGrid = true)
    val out = Anomaly.run(daily, preds)
    out.collect()
    val ops = walk(out.queryExecution.executedPlan)
    val ours = ops.flatMap(_.expressions.flatMap(_.collect {
      case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF
          if u.function.getClass.getName.startsWith("graft") => u
    }))
    assert(ours.isEmpty, "graft-authored ScalaUDF in anomaly plan")
    assert(ops.exists(_.expressions.exists(_.collectFirst {
      case c: graft.functions.CentroidDist => c
    }.isDefined)), "expected CentroidDist in the anomaly plan")
  }
}
