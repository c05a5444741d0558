package graft.feat

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid resampling with gap fill — meter/sensor series arrive with
  * missing days, and every downstream window feature (lags, rolling stats)
  * silently mis-frames on a ragged axis. This materializes each key's full
  * daily grid and carries the last observation forward (LOCF).
  *
  * Scale: the grid explode is per-key and bounded by the key's own span
  * (narrow, no shuffle); the join and the fill window shuffle on the key
  * once each — the fill reuses the join's output partitioning.
  */
object Resample {

  /** Daily grid per key from its own [min, max] date span, left-joined to
    * the observations, LOCF-filled. Adds `was_gap` (1 for synthesized
    * rows). The first grid row of a key is never synthetic (the span
    * starts at an observation), so `value_filled` is never null.
    */
  def dailyLocf(df: DataFrame, keyCol: String, dateCol: String,
                valueCol: String): DataFrame = {
    val span = df.groupBy(col(keyCol))
      .agg(min(col(dateCol)).as("__d0"), max(col(dateCol)).as("__d1"))
    val grid = span.select(col(keyCol),
      explode(sequence(col("__d0"), col("__d1"))).as(dateCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(df.select(col(keyCol), col(dateCol), col(valueCol)),
        Seq(keyCol, dateCol), "left")
      .withColumn("was_gap", col(valueCol).isNull.cast("long"))
      .withColumn("value_filled",
        last(col(valueCol), ignoreNulls = true).over(w))
      .drop(valueCol)
  }

  /** Linear-interpolation variant: gaps take the line between the previous
    * and next observation (weighted by day offset); span edges can only
    * carry (the first/last grid row is always an observation, so both
    * anchors exist for every gap). Two windows over the same (key, date)
    * sort — one partitioning, one sort, two frames.
    */
  def dailyLerp(df: DataFrame, keyCol: String, dateCol: String,
                valueCol: String): DataFrame = {
    val span = df.groupBy(col(keyCol))
      .agg(min(col(dateCol)).as("__d0"), max(col(dateCol)).as("__d1"))
    val grid = span.select(col(keyCol),
      explode(sequence(col("__d0"), col("__d1"))).as(dateCol))
    val back = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val joined = grid.join(df.select(col(keyCol), col(dateCol), col(valueCol)),
        Seq(keyCol, dateCol), "left")
      .withColumn("was_gap", col(valueCol).isNull.cast("long"))
      .withColumn("__pv", last(col(valueCol), ignoreNulls = true).over(back))
      .withColumn("__pd", last(when(col(valueCol).isNotNull, col(dateCol)),
        ignoreNulls = true).over(back))
      .withColumn("__nv", first(col(valueCol), ignoreNulls = true).over(fwd))
      .withColumn("__nd", first(when(col(valueCol).isNotNull, col(dateCol)),
        ignoreNulls = true).over(fwd))
    joined.withColumn("value_filled",
        when(col("was_gap") === 0, col(valueCol))
          .otherwise(col("__pv") +
            (col("__nv") - col("__pv")) *
              datediff(col(dateCol), col("__pd")).cast("double") /
              datediff(col("__nd"), col("__pd")).cast("double")))
      .select(col(keyCol), col(dateCol), col("was_gap"), col("value_filled"))
  }
}
