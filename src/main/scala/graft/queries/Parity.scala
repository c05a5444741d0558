package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.etl.Clean
import graft.io.Tables

/** Shared oracle-parity helpers (see SURVEY.md §5.2, FIXTURES.md §B).
  *
  * Float discipline:
  *  - [[dsum]]: sums go through DECIMAL(18,4) — decimal addition is exact
  *    and order-independent, so Spark and DuckDB agree bit-for-bit no matter
  *    how partitions combine. Holds at any scale, including 100 TB.
  *  - [[ground]]: guard-round for iterative aggs (avg/stddev/corr) whose
  *    last-ulp error differs between engines: +1e-9 pushes values sitting
  *    exactly on a rounding boundary to the same side on both sides.
  */
object Parity {
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")
  def ground(c: Column, s: Int): Column = round(c + lit(1e-9), s)

  /** SQL twin of [[dsum]]. */
  def sqlDsum(expr: String): String =
    s"CAST(sum(CAST($expr AS DECIMAL(18,4))) AS DOUBLE)"
  /** SQL twin of [[ground]]. */
  def sqlGround(expr: String, s: Int): String = s"round($expr + 1e-9, $s)"
  /** DuckDB twin of [[graft.ext.Sampling.hashBucket]]. */
  def sqlBucket(salt: String, idExpr: String): String =
    s"('0x' || substr(md5('$salt:' || $idExpr), 1, 8))::BIGINT % 100"
  /** DuckDB twin of [[graft.ext.Sampling.hashKey]] (unbucketed). */
  def sqlHashKey(salt: String, idExpr: String): String =
    s"('0x' || substr(md5('$salt:' || $idExpr), 1, 8))::BIGINT"

  /** events + time features (Clean F1-F4), shared by most queries. */
  def eventsT(s: SparkSession, dir: String): DataFrame =
    Clean.withTimeFeatures(Tables.events(s, dir), "ts")

  /** The daily rollup (A2) every downstream feature query builds on.
    * daily_value is a decimal-exact sum, so lag/rolling values downstream
    * are bit-identical to the oracle's CTE.
    */
  def daily(s: SparkSession, dir: String): DataFrame =
    eventsT(s, dir).groupBy(col("user_id"), col("date"))
      .agg(dsum(col("value")).as("daily_value"),
        count(lit(1)).as("num_readings"))
      .withColumn("avg_reading",
        ground(col("daily_value") / col("num_readings"), 4))

  /** Oracle-side twin of [[daily]] (a `WITH daily AS (...)` prefix). */
  val dailySql: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS "date",
      |         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS daily_value,
      |         count(*) AS num_readings,
      |         round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
      |               / count(*) + 1e-9, 4) AS avg_reading
      |  FROM events GROUP BY 1, 2
      |)""".stripMargin
}
