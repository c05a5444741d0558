package graft.feat

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream — the classic clickstream /
  * telemetry operator the reference's event model implies but never built:
  * a session is a maximal run of a user's events where consecutive gaps
  * stay within `gapMinutes`.
  *
  * Scale shape: ONE shuffle (partition by user) + per-partition sort; the
  * lag, the boundary flag, and the running session index all ride the same
  * window spec, so Catalyst computes them in a single Window node. The
  * per-session rollup then re-uses the same (user) partitioning —
  * HashPartitioning(user) satisfies the (user, session) clustering, so the
  * executed plan has exactly one hash exchange end-to-end (asserted in
  * PhysicalSpec).
  *
  * Skew caveat (inherent to ordered per-key windows): one user's entire
  * history lands in one task. A bot key with billions of events is the
  * hazard at corpus scale — mitigate upstream (drop/ratelimit known bot
  * ids, or pre-split such keys by coarse time range and merge boundary
  * sessions in a second pass); salting is NOT applicable because session
  * assignment needs the key's full time order.
  *
  * Gap arithmetic is in epoch MICROSECONDS (`unix_micros`), matching
  * DuckDB's `epoch_us` exactly — second-truncated gaps would misclassify
  * boundaries within a second of the threshold.
  */
object Sessions {

  /** Per-event session assignment: adds `session_id` (1-based per-user
    * index). Ties in `tsCol` share a gap of zero and therefore a session,
    * so the result is deterministic under any partitioning.
    */
  def assignSessions(events: DataFrame, idCol: String, tsCol: String,
                     gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("__us"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("__us", unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("__prev", lag(col("__us"), 1).over(w))
      .withColumn("__new",
        (col("__prev").isNull || col("__us") - col("__prev") > gapUs)
          .cast("long"))
      .withColumn("session_id", sum(col("__new")).over(run))
      .drop("__us", "__prev", "__new")
  }

  /** Spark's NATIVE session operator (`session_window`): merges events
    * whose gap is at MOST `gapMinutes` — an event landing exactly at the
    * boundary still merges (verified empirically on Spark 4.1.2), the same
    * strict-greater-than boundary as [[assignSessions]]. The emitted
    * window end is `last event + gap` (not the last event time — that is
    * the operator's contract). Same plan in batch and streaming (streaming
    * needs an upstream watermark for append mode). Use [[assignSessions]]
    * when the per-EVENT session id is needed; this form only yields
    * per-session rollups.
    */
  def sessionWindows(events: DataFrame, idCol: String, tsCol: String,
                     gapMinutes: Int): DataFrame =
    events
      .groupBy(session_window(col(tsCol), s"$gapMinutes minutes"),
        col(idCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(idCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Per-session rollup: bounds, event count, duration (µs — exact long,
    * no float drift in the correctness gate), plus caller-supplied value
    * aggregations (`extraAggs`, e.g. a decimal-exact value sum).
    */
  def sessionize(events: DataFrame, idCol: String, tsCol: String,
                 gapMinutes: Int,
                 extraAggs: Seq[org.apache.spark.sql.Column] = Nil)
      : DataFrame =
    assignSessions(events, idCol, tsCol, gapMinutes)
      .groupBy(col(idCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        (Seq(
          max(col(tsCol)).as("session_end"),
          count(lit(1)).as("n_events"),
          (unix_micros(max(col(tsCol)).cast("timestamp")) -
            unix_micros(min(col(tsCol)).cast("timestamp")))
            .as("duration_us")) ++ extraAggs): _*)
}
