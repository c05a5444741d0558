package graft.feat

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-entity time-series feature windows (SURVEY.md §2.5 W1-W4, §2.2
  * P10-P12, §2.7 F5-F8).
  *
  * Every window here is `partitionBy(id).orderBy(date)` — one shuffle by id,
  * after which ALL lag/rolling columns are computed in a single Window node
  * (Catalyst merges same-spec window expressions), so adding a feature does
  * not add a shuffle. The reference instead ran a driver-side loop over
  * 500-household batches (`feature_engineering.py:286-366`) to bound memory;
  * partition-parallel windows make that unnecessary at any scale.
  *
  * Frames are ROWS frames with the current row EXCLUDED — the reference's
  * leakage guard (`forecasting_model.py:88-90`). Gaps in the date series
  * therefore shift the window (7 rows ≠ 7 calendar days); preserved on
  * purpose (SURVEY.md §7.4.1).
  */
object Windows {

  /** The truncated π the reference hard-codes (`feature_engineering.py:142`),
    * kept for golden parity of cyclical encodings.
    */
  val RefPi = 3.14159

  def byId(idCol: String, orderCol: String) =
    Window.partitionBy(col(idCol)).orderBy(col(orderCol))

  /** W1: lag_k columns, k ∈ lags (`feature_engineering.py:83-89`). */
  def addLags(df: DataFrame, idCol: String, orderCol: String, valueCol: String,
              lags: Seq[Int] = Seq(1, 2, 3, 7, 14, 30)): DataFrame = {
    val w = byId(idCol, orderCol)
    lags.foldLeft(df)((d, k) =>
      d.withColumn(s"lag_${k}_day", lag(col(valueCol), k).over(w)))
  }

  /** W2-W4: rolling avg/std over 7 and 30 trailing rows, min/max/sum over 7
    * (`feature_engineering.py:94-122`). Current row excluded.
    */
  def addRolling(df: DataFrame, idCol: String, orderCol: String,
                 valueCol: String): DataFrame = {
    val w  = byId(idCol, orderCol)
    val v  = col(valueCol)
    val w7  = w.rowsBetween(-7, -1)
    val w30 = w.rowsBetween(-30, -1)
    df.withColumn("rolling_avg_7d", avg(v).over(w7))
      .withColumn("rolling_std_7d", stddev(v).over(w7))
      .withColumn("rolling_avg_30d", avg(v).over(w30))
      .withColumn("rolling_std_30d", stddev(v).over(w30))
      .withColumn("rolling_min_7d", min(v).over(w7))
      .withColumn("rolling_max_7d", max(v).over(w7))
      .withColumn("rolling_sum_7d", sum(v).over(w7))
  }

  /** P10: weekend flag. The reference has three inconsistent definitions
    * (SURVEY.md §2.2 P10); each is exposed so parity tests can pin the
    * variant a call-site used.
    */
  object Weekend {
    /** `feature_engineering.py:127`: weekday name ∈ {Sat, Sun}. */
    def byName(weekdayName: Column): Column =
      when(weekdayName.isin("Sat", "Sun"), 1).otherwise(0)
    /** `forecasting_model.py:108`: dayofweek ∈ {1, 7} (Sun/Sat). */
    def byDayOfWeek(dayOfWeek: Column): Column =
      when(dayOfWeek.isin(1, 7), 1).otherwise(0)
    /** `anomaly_detection.py:94`: dayofweek >= 6 — actually Fri+Sat. */
    def byGte6(dayOfWeek: Column): Column =
      (dayOfWeek >= 6).cast("int")
  }

  /** P10: northern-hemisphere season one-hots
    * (`feature_engineering.py:129-138`).
    */
  def addSeasons(df: DataFrame, monthCol: String = "month"): DataFrame = {
    val m = col(monthCol)
    df.withColumn("is_summer", when(m.isin(6, 7, 8), 1).otherwise(0))
      .withColumn("is_winter", when(m.isin(12, 1, 2), 1).otherwise(0))
      .withColumn("is_spring", when(m.isin(3, 4, 5), 1).otherwise(0))
      .withColumn("is_fall",   when(m.isin(9, 10, 11), 1).otherwise(0))
  }

  /** F5: cyclical month/day encodings with the reference's truncated π
    * (`feature_engineering.py:142-148`).
    */
  def addCyclical(df: DataFrame, monthCol: String = "month",
                  dayCol: String = "day"): DataFrame = {
    val m = col(monthCol); val d = col(dayCol)
    df.withColumn("month_sin", sin(lit(2 * RefPi) * m / 12))
      .withColumn("month_cos", cos(lit(2 * RefPi) * m / 12))
      .withColumn("day_sin", sin(lit(2 * RefPi) * d / 31))
      .withColumn("day_cos", cos(lit(2 * RefPi) * d / 31))
  }

  /** F6-F8: derived arithmetic features
    * (`feature_engineering.py:174-191`): day-over-day change, pct change
    * (null on /0 — `try_divide`, F7), deviations from rolling means, and the
    * guarded z-score variant `when(std>0, std).otherwise(1)`
    * (`feature_engineering.py:188-190`).
    */
  def addDerived(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol)
    df.withColumn("energy_change", v - col("lag_1_day"))
      .withColumn("energy_change_pct",
        try_divide(v - col("lag_1_day"), col("lag_1_day")))
      .withColumn("deviation_from_avg_7d", v - col("rolling_avg_7d"))
      .withColumn("deviation_from_avg_30d", v - col("rolling_avg_30d"))
      .withColumn("z_score_7d",
        (v - col("rolling_avg_7d")) /
          when(col("rolling_std_7d") > 0, col("rolling_std_7d")).otherwise(lit(1)))
  }

  /** P11: one-hot over a bounded-cardinality label column. The reference
    * `distinct().collect()`s the labels then emits one `when` per label
    * (`feature_engineering.py:162-168`) — safe only because the domain is
    * tiny (≤ a handful of tariff labels); we keep that contract and sort the
    * collected labels for deterministic column order.
    */
  def addOneHot(df: DataFrame, labelCol: String, prefix: String,
                maxLabels: Int = 1000): DataFrame = {
    // cardinality guard: limit(maxLabels+1) bounds BOTH the collect and the
    // distinct shuffle — a high-cardinality column fails fast instead of
    // OOMing the driver with an unbounded collect. Nulls are filtered
    // BEFORE the limit: a null row consuming the sentinel slot would let
    // an over-cardinality column slip past the require with an arbitrary
    // label subset.
    val labels = df.select(labelCol).filter(col(labelCol).isNotNull)
      .distinct().limit(maxLabels + 1).collect()
      .map(_.getString(0)).sorted
    require(labels.length <= maxLabels,
      s"addOneHot: '$labelCol' has more than $maxLabels distinct labels — " +
        "one-hot on an unbounded domain; raise maxLabels only if intended")
    labels.foldLeft(df)((d, lbl) =>
      d.withColumn(s"${prefix}_${lbl.toLowerCase}",
        when(col(labelCol) === lbl, 1).otherwise(0)))
  }

  /** P12: supply defaults for expected-but-missing columns
    * (`forecasting_model.py:135-153`): each (name → default expression) is
    * added only when the column is absent, so upstream variants with and
    * without the column produce a uniform downstream schema. Pure plan
    * transformation — no action, no shuffle.
    */
  def withDefaults(df: DataFrame, defaults: Seq[(String, Column)]): DataFrame =
    defaults.foldLeft(df) { case (d, (name, dflt)) =>
      if (d.columns.contains(name)) d else d.withColumn(name, dflt)
    }

  /** W5 at scale: per-group mean/std via groupBy + join-back instead of an
    * unbounded window (`anomaly_detection.py:132-140` puts each cluster in
    * ONE partition — a skew cliff at 100 TB; the agg+join form is
    * algebraically identical and shuffles only group-sized rows).
    *
    * No forced broadcast: the stats frame has one row per group, and group
    * cardinality is unbounded (per-user stats at 100 TB is millions of
    * rows). AQE broadcasts it when it is actually small and falls back to a
    * shuffled join when it is not — forcing `broadcast()` here would OOM
    * the driver at exactly the scale this function exists for.
    */
  def addGroupStats(df: DataFrame, groupCol: String, valueCol: String,
                    meanName: String = "group_mean",
                    stdName: String = "group_std"): DataFrame = {
    val stats = df.groupBy(col(groupCol)).agg(
      avg(col(valueCol)).as(meanName),
      stddev(col(valueCol)).as(stdName))
    df.join(stats, Seq(groupCol), "left")
  }
}
