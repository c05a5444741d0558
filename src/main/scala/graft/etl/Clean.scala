package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Row-level cleaning + time-feature projection (SURVEY.md §2.2, §2.7).
  *
  * All of these are narrow (no shuffle) and stay inside whole-stage codegen;
  * at 100 TB they ride along with the scan for free.
  */
object Clean {

  /** P2: literal-sentinel → NULL (`data_preprocessing.py:132-134`, the
    * `"Null"` string in the raw energy column).
    */
  def nullSentinel(c: Column, sentinel: String = "Null"): Column =
    when(c === lit(sentinel), lit(null)).otherwise(c)

  /** P2+P3 fused: sentinel-replace then cast
    * (`data_preprocessing.py:132-137`).
    */
  def sentinelCast(c: Column, to: DataType, sentinel: String = "Null"): Column =
    nullSentinel(c, sentinel).cast(to)

  /** P4: drop rows null in key columns (`data_preprocessing.py:111,141`). */
  def dropNullKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.na.drop(keys)

  /** P14: fillna by dtype — numeric→0, string→"Unknown"
    * (`merge_csv_for_mongodb.py:119-127`).
    */
  def fillDefaults(df: DataFrame): DataFrame = {
    val (numeric, string) = df.schema.fields.partition(f =>
      f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
    df.na.fill(0, numeric.map(_.name))
      .na.fill("Unknown", string.filter(_.dataType ==
        org.apache.spark.sql.types.StringType).map(_.name))
  }

  /** F1-F4: the reference's time-feature projection
    * (`data_preprocessing.py:147-152`, `forecasting_model.py:102-105`):
    * date (as DateType — the reference keeps a `yyyy-MM-dd` string; we use
    * the proper type, which preserves its ISO lexicographic ordering),
    * hour, year, month, day-of-month, weekday name ("Mon".."Sun") and
    * numeric dayofweek (1=Sun..7=Sat, Spark convention).
    */
  def withTimeFeatures(df: DataFrame, tsCol: String): DataFrame =
    df.withColumn("date", to_date(col(tsCol)))
      .withColumn("hour", hour(col(tsCol)))
      .withColumn("year", year(col(tsCol)))
      .withColumn("month", month(col(tsCol)))
      .withColumn("day", dayofmonth(col(tsCol)))
      .withColumn("weekday", date_format(col(tsCol), "E"))
      .withColumn("day_of_week", dayofweek(col(tsCol)))
}
