package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.Aggregate
import graft.feat.Windows
import graft.analytics.{Queries => Q}
import graft.io.Tables
import Parity._

/** The reference's ETL/window spine (SURVEY.md §2.1-§2.6 core rows). */
object CoreQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A2/A1: daily rollup — groupBy + sum/avg/count (data_preprocessing.py:246-261)
    "q_daily_agg" -> ((s, dir) =>
      daily(s, dir).orderBy(col("user_id"), col("date"))),

    // A1: hourly rollup (data_preprocessing.py:223-234)
    "q_hourly_agg" -> ((s, dir) =>
      eventsT(s, dir)
        .groupBy(col("user_id"), col("date"), col("hour"))
        .agg(dsum(col("value")).as("hourly_value"),
          count(lit(1)).as("num_readings"))
        .select(col("user_id"), col("date"), col("hour").cast("long").as("hour"),
          col("hourly_value"),
          ground(col("hourly_value") / col("num_readings"), 4).as("avg_reading"),
          col("num_readings"))
        .orderBy(col("user_id"), col("date"), col("hour"))),

    // F1-F4 + P10: time-feature projection (data_preprocessing.py:147-152)
    "q_time_features" -> ((s, dir) =>
      eventsT(s, dir)
        .select(col("date"),
          col("year").cast("long").as("year"),
          col("month").cast("long").as("month"),
          col("day").cast("long").as("day"),
          col("weekday"),
          col("day_of_week").cast("long").as("day_of_week"),
          Windows.Weekend.byName(col("weekday")).cast("long").as("is_weekend"))
        .distinct()
        .orderBy(col("date"))),

    // W1: lag features per user (feature_engineering.py:83-89)
    "q_lag_features" -> ((s, dir) =>
      Windows.addLags(daily(s, dir), "user_id", "date", "daily_value")
        .select(Seq("user_id", "date", "daily_value", "lag_1_day", "lag_2_day",
          "lag_3_day", "lag_7_day", "lag_14_day", "lag_30_day").map(col): _*)
        .orderBy(col("user_id"), col("date"))),

    // W2-W4: rolling stats, ROWS frames, current row excluded
    // (feature_engineering.py:94-122)
    "q_rolling_stats" -> ((s, dir) =>
      Windows.addRolling(daily(s, dir), "user_id", "date", "daily_value")
        .select(col("user_id"), col("date"), col("daily_value"),
          ground(col("rolling_avg_7d"), 4).as("rolling_avg_7d"),
          ground(col("rolling_std_7d"), 4).as("rolling_std_7d"),
          ground(col("rolling_avg_30d"), 4).as("rolling_avg_30d"),
          ground(col("rolling_std_30d"), 4).as("rolling_std_30d"),
          col("rolling_min_7d"), col("rolling_max_7d"),
          ground(col("rolling_sum_7d"), 4).as("rolling_sum_7d"))
        .orderBy(col("user_id"), col("date"))),

    // A8/O2: top-N consumers, deterministic tie-break
    // (anomaly_detection.py:150-153, streamlit_app.py:481)
    "q_topk_users" -> ((s, dir) => {
      val totals = Tables.events(s, dir).groupBy(col("user_id"))
        .agg(dsum(col("value")).as("total_value"),
          count(lit(1)).as("n_events"))
      Q.topN(totals, Seq(col("total_value").desc, col("user_id")), 10)
    }),

    // J1: fact ⋈ small dim, left, broadcast (data_preprocessing.py:182)
    "q_dim_join" -> ((s, dir) =>
      Aggregate.dimJoin(Tables.orders(s, dir), Tables.customer(s, dir),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_totalprice"),
          col("c_name"), col("c_mktsegment"))
        .orderBy(col("o_orderkey"))),

    // A1-analog on lineitem with arithmetic F6: TPC-H Q1-shaped rollup
    "q_lineitem_rollup" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", ground(col("sum_qty") / col("count_order"), 4))
        .withColumn("avg_price",
          ground(col("sum_base_price") / col("count_order"), 4))
        .orderBy(col("l_returnflag"), col("l_linestatus")))
  )

  val oracles: Map[String, String] = Map(

    "q_daily_agg" ->
      s"""$dailySql SELECT * FROM daily ORDER BY user_id, "date"""",

    "q_hourly_agg" ->
      s"""SELECT user_id, CAST(ts AS DATE) AS "date",
         |       CAST(extract(hour FROM ts) AS BIGINT) AS hour,
         |       ${sqlDsum("value")} AS hourly_value,
         |       ${sqlGround(s"${sqlDsum("value")} / count(*)", 4)} AS avg_reading,
         |       count(*) AS num_readings
         |FROM events GROUP BY 1, 2, 3
         |ORDER BY user_id, "date", hour""".stripMargin,

    "q_time_features" ->
      """SELECT DISTINCT CAST(ts AS DATE) AS "date",
        |       CAST(extract(year FROM ts) AS BIGINT) AS year,
        |       CAST(extract(month FROM ts) AS BIGINT) AS month,
        |       CAST(extract(day FROM ts) AS BIGINT) AS day,
        |       strftime(ts, '%a') AS weekday,
        |       CAST(dayofweek(ts) + 1 AS BIGINT) AS day_of_week,
        |       CAST(CASE WHEN strftime(ts, '%a') IN ('Sat','Sun')
        |                 THEN 1 ELSE 0 END AS BIGINT) AS is_weekend
        |FROM events ORDER BY "date"""".stripMargin,

    "q_lag_features" ->
      s"""$dailySql
         |SELECT user_id, "date", daily_value,
         |       lag(daily_value, 1)  OVER w AS lag_1_day,
         |       lag(daily_value, 2)  OVER w AS lag_2_day,
         |       lag(daily_value, 3)  OVER w AS lag_3_day,
         |       lag(daily_value, 7)  OVER w AS lag_7_day,
         |       lag(daily_value, 14) OVER w AS lag_14_day,
         |       lag(daily_value, 30) OVER w AS lag_30_day
         |FROM daily
         |WINDOW w AS (PARTITION BY user_id ORDER BY "date")
         |ORDER BY user_id, "date"""".stripMargin,

    "q_rolling_stats" ->
      s"""$dailySql
         |SELECT user_id, "date", daily_value,
         |  round(avg(daily_value)    OVER w7  + 1e-9, 4) AS rolling_avg_7d,
         |  round(stddev(daily_value) OVER w7  + 1e-9, 4) AS rolling_std_7d,
         |  round(avg(daily_value)    OVER w30 + 1e-9, 4) AS rolling_avg_30d,
         |  round(stddev(daily_value) OVER w30 + 1e-9, 4) AS rolling_std_30d,
         |  min(daily_value)          OVER w7 AS rolling_min_7d,
         |  max(daily_value)          OVER w7 AS rolling_max_7d,
         |  round(sum(daily_value)    OVER w7  + 1e-9, 4) AS rolling_sum_7d
         |FROM daily
         |WINDOW
         |  w7 AS (PARTITION BY user_id ORDER BY "date"
         |         ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING),
         |  w30 AS (PARTITION BY user_id ORDER BY "date"
         |          ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING)
         |ORDER BY user_id, "date"""".stripMargin,

    "q_topk_users" ->
      s"""SELECT user_id, ${sqlDsum("value")} AS total_value,
         |       count(*) AS n_events
         |FROM events GROUP BY user_id
         |ORDER BY total_value DESC, user_id LIMIT 10""".stripMargin,

    "q_dim_join" ->
      """SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_lineitem_rollup" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
         |  ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |  count(*) AS count_order,
         |  ${sqlGround(s"${sqlDsum("l_quantity")} / count(*)", 4)} AS avg_qty,
         |  ${sqlGround(s"${sqlDsum("l_extendedprice")} / count(*)", 4)} AS avg_price
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
