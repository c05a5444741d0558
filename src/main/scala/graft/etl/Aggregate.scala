package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's aggregation spine (SURVEY.md §2.4 A1-A2) and its dim join
  * (§2.3 J1), generalized over column names.
  *
  * Scale posture: `groupBy(...).agg(...)` compiles to partial+final
  * HashAggregate (map-side combine before the shuffle), so the shuffle
  * carries one row per (user, day[, hour]) per input partition — at 100 TB
  * the reduction happens before the wire, not after. The dim join broadcasts
  * the small side explicitly rather than trusting the 10 MB auto threshold.
  */
object Aggregate {

  /** A1: hourly rollup (`data_preprocessing.py:223-234`).
    * Input must already carry `date`/`hour` (see [[Clean.withTimeFeatures]]).
    */
  def hourly(df: DataFrame, idCol: String, valueCol: String,
             extraKeys: Seq[String] = Nil): DataFrame = {
    val keys = (Seq(idCol, "date", "hour") ++ extraKeys).map(col)
    df.groupBy(keys: _*).agg(
      sum(col(valueCol)).as("hourly_value"),
      avg(col(valueCol)).as("avg_reading"),
      count(lit(1)).as("num_readings"))
  }

  /** A2: daily rollup straight from readings
    * (semantics of `data_preprocessing.py:246-261` — the reference re-aggs
    * the hourly table; summing readings directly is algebraically identical
    * for sum/count and avoids materializing the intermediate at scale).
    */
  def daily(df: DataFrame, idCol: String, valueCol: String,
            extraKeys: Seq[String] = Nil): DataFrame = {
    val keys = (Seq(idCol, "date") ++ extraKeys).map(col)
    df.groupBy(keys: _*).agg(
      sum(col(valueCol)).as("daily_value"),
      avg(col(valueCol)).as("avg_reading"),
      count(lit(1)).as("num_readings"))
  }

  /** J1: fact ⋈ small dim, left, broadcast
    * (`data_preprocessing.py:182` — 167M-row fact × 17,520-row dim).
    * Explicit `broadcast()` so the plan is a BroadcastHashJoin regardless of
    * statistics; a shuffle join here would move the entire fact table.
    */
  def dimJoin(fact: DataFrame, dim: DataFrame, joinExpr: Column): DataFrame =
    fact.join(broadcast(dim), joinExpr, "left")

  /** J2: composite-key left join (`anomaly_detection.py:85-86`). At scale
    * both sides shuffle on the same keys; Catalyst/AQE picks sort-merge or
    * shuffled-hash.
    */
  def keyJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
              how: String = "left"): DataFrame =
    left.join(right, keys, how)
}
