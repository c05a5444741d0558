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

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // M1-M4+M7+M8+M11: LR forecast with time-aware grid validation
    "q_ml_forecast" -> ((s, dir) => {
      val (preds, _) = Forecast.run(daily(s, dir))
      preds.orderBy(col("user_id"), col("date"))
    }),

    // M9+U1+W5: KMeans anomaly detection over forecast residuals
    "q_ml_anomaly" -> ((s, dir) => {
      val d = daily(s, dir)
      val (preds, _) = Forecast.run(d)
      Anomaly.run(d, preds).orderBy(col("user_id"), col("date"))
    })
  )

  val oracles: Map[String, String] = Map.empty
}
