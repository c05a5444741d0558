package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.{Anomaly, Forecast}
import Parity._

/** ML-operator queries (SURVEY.md §2.9). Not SQL-expressible → no DuckDB
  * oracle (driver records rows-only); verified by seeded invariants in
  * scalatest (SURVEY.md §5.4: metric ranges + determinism, never
  * hash-equality — KMeans/RF floats vary with partitioning).
  */
object MlQueries {

  /** One forecast fit per (session, sfDir) — q_ml_anomaly consumes
    * q_ml_forecast's predictions (the reference pipeline's stage 4 → 5
    * dataflow), so recomputing the whole grid per query would double-count
    * training time in benchmarks for no semantic difference. Weak keys: a
    * stopped-and-dropped session must not be pinned by the memo.
    */
  private val memo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String, DataFrame]]())

  private def forecastPreds(s: SparkSession, dir: String): DataFrame = {
    val perSession = memo.synchronized {
      var m = memo.get(s)
      if (m == null) { m = scala.collection.mutable.Map.empty; memo.put(s, m) }
      m
    }
    perSession.synchronized {
      perSession.getOrElseUpdate(dir, {
        // ONLY (id, date, target) feeds the model — daily's derived
        // avg_reading/num_readings are same-day functions of the target
        // and would leak the label into the features
        val base = daily(s, dir).select(col("user_id"), col("date"),
          col("daily_value"))
        // run() returns preds already cached + materialized
        val (preds, _) = Forecast.run(base)
        preds
      })
    }
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // M1-M4+M7+M8+M11: LR forecast with time-aware grid validation
    "q_ml_forecast" -> ((s, dir) =>
      forecastPreds(s, dir).orderBy(col("user_id"), col("date"))),

    // M9+U1+W5: KMeans anomaly detection over forecast residuals
    "q_ml_anomaly" -> ((s, dir) =>
      Anomaly.run(daily(s, dir), forecastPreds(s, dir))
        .orderBy(col("user_id"), col("date")))
  )

  val oracles: Map[String, String] = Map.empty
}
