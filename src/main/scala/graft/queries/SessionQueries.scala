package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Sampling
import graft.feat.Sessions
import graft.io.Tables
import Parity._

/** Sessionization and deterministic-sampling queries over `events` /
  * `documents` — operators a training-data pipeline needs around the
  * reference's event model (session features, stable corpus splits).
  */
object SessionQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Gap-based sessionization: 30-min inactivity closes a session
    "q_sessionize" -> ((s, dir) =>
      Sessions.sessionize(Tables.events(s, dir), "user_id", "ts",
          gapMinutes = 30, extraAggs = Seq(dsum(col("value")).as("sum_value")))
        .orderBy(col("user_id"), col("session_id"))),

    // Native session_window operator (same gap, Spark's built-in session
    // semantics: window end = last event + gap)
    "q_session_window" -> ((s, dir) =>
      Sessions.sessionWindows(Tables.events(s, dir), "user_id", "ts",
          gapMinutes = 30)
        .orderBy(col("user_id"), col("session_start"))),

    // Time-RANGE window frame (W-family beyond the ROWS frames): per
    // event, the user's trailing-hour activity. RANGE frames bound by
    // event-time VALUE, so ties (equal timestamps) are frame peers in both
    // engines; the frame key is epoch micros (engine-portable ordering),
    // and the windowed sum goes through DECIMAL for order-independent
    // exactness.
    "q_range_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val ev = Tables.events(s, dir)
        .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-3600L * 1000000L, 0)
      ev.select(col("event_id"), col("user_id"), col("ts"),
          count(lit(1)).over(w).as("n_last_hour"),
          sum(col("value").cast(DecimalType(18, 4))).over(w)
            .cast("double").as("sum_last_hour"))
        .orderBy(col("event_id"))
    }),

    // Deterministic 10% corpus sample — membership is a pure function of
    // the salted id (stable across runs/engines/repartitioning)
    "q_hash_sample" -> ((s, dir) =>
      Sampling.deterministicSample(Tables.documents(s, dir), "doc_id",
          salt = "graft", pct = 10)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))),

    // Stable 80/10/10 train/val/test assignment, verified via per-split
    // per-lang counts
    "q_train_split" -> ((s, dir) =>
      Sampling.withSplit(Tables.documents(s, dir), "doc_id", salt = "graft")
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("split"), col("lang")))
  )

  val oracles: Map[String, String] = Map(

    "q_sessionize" ->
      s"""WITH e AS (
         |  SELECT user_id, ts, value, epoch_us(ts) AS us FROM events
         |), flagged AS (
         |  SELECT user_id, ts, value, us,
         |    CASE WHEN lag(us) OVER w IS NULL
         |           OR us - lag(us) OVER w > 30 * 60 * 1000000
         |         THEN 1 ELSE 0 END AS is_new
         |  FROM e
         |  WINDOW w AS (PARTITION BY user_id ORDER BY us)
         |), numbered AS (
         |  SELECT user_id, ts, value, us,
         |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY us
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
         |  FROM flagged
         |)
         |SELECT user_id, session_id,
         |  min(ts) AS session_start, max(ts) AS session_end,
         |  count(*) AS n_events,
         |  max(us) - min(us) AS duration_us,
         |  ${sqlDsum("value")} AS sum_value
         |FROM numbered GROUP BY user_id, session_id
         |ORDER BY user_id, session_id""".stripMargin,

    // Same session grouping as q_sessionize — Spark's session_window
    // MERGES an event landing exactly at the gap boundary (verified
    // empirically: two events exactly gap apart form ONE session), i.e. a
    // new session needs gap STRICTLY greater than the threshold, matching
    // assignSessions; end = max(ts) + gap per session_window's contract.
    "q_session_window" ->
      s"""WITH e AS (
         |  SELECT user_id, ts, epoch_us(ts) AS us FROM events
         |), flagged AS (
         |  SELECT user_id, ts, us,
         |    CASE WHEN lag(us) OVER w IS NULL
         |           OR us - lag(us) OVER w > 30 * 60 * 1000000
         |         THEN 1 ELSE 0 END AS is_new
         |  FROM e
         |  WINDOW w AS (PARTITION BY user_id ORDER BY us)
         |), numbered AS (
         |  SELECT user_id, ts, us,
         |    sum(is_new) OVER (PARTITION BY user_id ORDER BY us
         |      ROWS UNBOUNDED PRECEDING) AS session_id
         |  FROM flagged
         |)
         |SELECT user_id,
         |  min(ts) AS session_start,
         |  max(ts) + INTERVAL 30 MINUTE AS session_end,
         |  count(*) AS n_events
         |FROM numbered GROUP BY user_id, session_id
         |ORDER BY user_id, session_start""".stripMargin,

    "q_range_window" ->
      """WITH e AS (
        |  SELECT event_id, user_id, ts, value, epoch_us(ts) AS us
        |  FROM events
        |)
        |SELECT event_id, user_id, ts,
        |  count(*) OVER w AS n_last_hour,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
        |    AS sum_last_hour
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q_hash_sample" ->
      s"""SELECT doc_id, lang, n_chars FROM documents
         |WHERE ${sqlBucket("graft", "doc_id")} < 10
         |ORDER BY doc_id""".stripMargin,

    "q_train_split" ->
      s"""WITH b AS (
         |  SELECT lang, ${sqlBucket("graft", "doc_id")} AS bkt FROM documents
         |)
         |SELECT CASE WHEN bkt < 80 THEN 'train'
         |            WHEN bkt < 90 THEN 'val'
         |            ELSE 'test' END AS split,
         |  lang, count(*) AS n
         |FROM b GROUP BY 1, 2 ORDER BY split, lang""".stripMargin
  )
}
