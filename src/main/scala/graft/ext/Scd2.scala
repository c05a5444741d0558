package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 compaction: turn an event/CDC stream of
  * attribute observations into versioned validity intervals — one row per
  * attribute CHANGE, with `valid_from`/`valid_to` bounds (`valid_to` null =
  * current version) and a per-key version number.
  *
  * Scale design: everything is per-key windows over one shuffle on the key
  * (all three window frames share the same partitioning, so Catalyst plans
  * a single Exchange + sort); run-length compaction happens BEFORE the
  * version numbering, so the second window pass only sees change rows. No
  * driver-side state, no joins.
  */
object Scd2 {

  /** Compact `df` (one observation per row) into SCD2 intervals.
    *
    * Same-instant observations for a key are first deterministically
    * collapsed to `min(attrCol)` — without that rule, `lag` ordering over
    * tied timestamps is partition-order-dependent and the output
    * nondeterministic (the same reason A2 replaced `first` with `min`).
    */
  def intervals(df: DataFrame, keyCol: String, tsCol: String,
                attrCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val collapsed = df.groupBy(col(keyCol), col(tsCol))
      .agg(min(col(attrCol)).as(attrCol))
    val changes = collapsed
      .withColumn("__prev", lag(col(attrCol), 1).over(byKey))
      .filter(col("__prev").isNull || col("__prev") =!= col(attrCol))
      .select(col(keyCol), col(tsCol).as("valid_from"), col(attrCol))
    val byFrom = Window.partitionBy(col(keyCol)).orderBy(col("valid_from"))
    changes
      .withColumn("version", row_number().over(byFrom))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byFrom))
      .select(col(keyCol), col("version"), col("valid_from"),
        col("valid_to"), col(attrCol))
  }
}
