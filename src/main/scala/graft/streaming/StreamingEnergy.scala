package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout
import org.apache.spark.sql.types.StructType

/** Structured Streaming forms of the engine's aggregation spine. The
  * reference has no streaming at all (SURVEY.md §2.10 — its "real-time"
  * dashboard is a cached batch read), but a meter-reading stream is the
  * natural extension: A1's hourly rollup becomes a watermarked window agg,
  * and per-user state (running totals) lives in `mapGroupsWithState`.
  *
  * Scale posture: watermark bounds state; the window agg partial-aggregates
  * before the shuffle exactly like its batch twin; the static side of
  * [[flagAgainstProfile]] is broadcast so the stream never shuffles.
  */
object StreamingEnergy {

  case class Reading(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class RunningTotal(user_id: Long, total: Double, n: Long)

  /** File-source stream with an explicit schema (required for streams). */
  def readStream(spark: SparkSession, dir: String, schema: StructType)
      : DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** A1 as a streaming windowed agg: watermarked tumbling hour windows per
    * user. Late data beyond the watermark is dropped deterministically.
    */
  def hourlyAgg(events: DataFrame, tsCol: String = "ts",
                idCol: String = "user_id", valueCol: String = "value",
                watermark: String = "2 hours"): DataFrame =
    events
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 hour").as("w"), col(idCol))
      .agg(sum(col(valueCol)).as("hourly_value"),
        avg(col(valueCol)).as("avg_reading"),
        count(lit(1)).as("num_readings"))
      .select(col("w.start").as("hour_start"), col(idCol),
        col("hourly_value"), col("avg_reading"), col("num_readings"))

  /** Custom per-key state: running total per user via `mapGroupsWithState`
    * (the streaming home of W1-W4-style evolving features).
    */
  def runningTotals(spark: SparkSession, events: DataFrame)
      : Dataset[RunningTotal] = {
    import spark.implicits._
    events.selectExpr("user_id", "cast(ts as timestamp) as ts", "value")
      .as[Reading]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (id: Long, rows: Iterator[Reading],
         state: org.apache.spark.sql.streaming.GroupState[RunningTotal]) =>
          val prev = state.getOption.getOrElse(RunningTotal(id, 0.0, 0L))
          val batch = rows.toSeq
          val next = RunningTotal(id, prev.total + batch.map(_.value).sum,
            prev.n + batch.size)
          state.update(next)
          next
      }
  }

  case class FunnelEvent(user_id: Long, event_type: String, us: Long)
  case class FunnelState(t1: Option[Long], t2: Option[Long], t3: Option[Long])
  case class FunnelStage(user_id: Long, stage: Long)

  /** One funnel transition: view → click → purchase, each stage's event
    * strictly after the previous stage and within `windowUs`. Stages are
    * monotone (first qualifying event wins — processed in time order this
    * equals the batch conditional-min formulation in q_funnel).
    */
  private[graft] def advanceFunnel(st: FunnelState, e: FunnelEvent,
                                   windowUs: Long): FunnelState =
    e.event_type match {
      case "view" if st.t1.isEmpty => st.copy(t1 = Some(e.us))
      case "click" if st.t2.isEmpty && st.t1.exists(t =>
        e.us > t && e.us <= t + windowUs) => st.copy(t2 = Some(e.us))
      case "purchase" if st.t3.isEmpty && st.t2.exists(t =>
        e.us > t && e.us <= t + windowUs) => st.copy(t3 = Some(e.us))
      case _ => st
    }

  /** Stateful streaming funnel: per-user stage machine over
    * `mapGroupsWithState`. State is three optional timestamps — O(1) per
    * user, no eviction needed. Events within a trigger are sorted by event
    * time before folding (state functions receive unordered iterators);
    * across triggers the monotone stages make late re-processing a no-op.
    * Emits the user's current stage (0 = no view yet) after each trigger.
    */
  def funnelStages(spark: SparkSession, events: DataFrame,
                   windowUs: Long = 86400000000L): Dataset[FunnelStage] = {
    import spark.implicits._
    events.selectExpr("user_id", "event_type",
        "unix_micros(cast(ts as timestamp)) as us")
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (id: Long, rows: Iterator[FunnelEvent],
         state: org.apache.spark.sql.streaming.GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(None, None, None))
          rows.toSeq.sortBy(e => (e.us, e.event_type)).foreach { e =>
            st = advanceFunnel(st, e, windowUs)
          }
          state.update(st)
          FunnelStage(id,
            if (st.t3.nonEmpty) 3L
            else if (st.t2.nonEmpty) 2L
            else if (st.t1.nonEmpty) 1L else 0L)
      }
  }

  /** @param watermark days strictly below this have been EVICTED and are
    *                  final; "" until the first eviction (accept anything —
    *                  out-of-order days arriving before the state ever
    *                  filled must still emit, like the unbounded form).
    */
  case class DayState(sums: Map[String, Double], emitted: Set[String],
                      watermark: String = "")
  case class DailyFeatures(user_id: Long, date: String, daily_value: Double,
                           lag_1_day: Option[Double],
                           rolling_avg_7d: Option[Double],
                           rolling_sum_7d: Option[Double])

  /** One state transition of [[streamingDailyFeatures]], factored out so
    * the eviction policy is unit-testable without a running stream.
    *
    * Eviction keeps state BOUNDED at `frameDays + 1` day entries per user
    * (the trailing frame plus the still-open max day) — without it the
    * per-user sums map and emitted set grow with stream length, which is
    * the state-store killer on an unbounded stream. Two consequences,
    * both watermark-like and deterministic:
    *  - events for days older than the oldest retained day are DROPPED
    *    (late beyond the frame horizon — the batch twin would have
    *    re-stated the day; a stream cannot, since the day already emitted);
    *  - the emitted set never outgrows the retained window, because a
    *    dropped day can never re-emit.
    */
  private[graft] def advanceDayState(
      id: Long, prev: DayState, incoming: Iterator[(Long, String, Double)],
      frameDays: Int): (DayState, Seq[DailyFeatures]) = {
    // drop only what EVICTION finalized (ISO dates compare
    // lexicographically; "" accepts everything until the first eviction).
    // Filtering on the oldest *retained* day instead would silently drop
    // out-of-order days that arrive before the state ever fills.
    val sums = incoming.filter(_._2 >= prev.watermark)
      .foldLeft(prev.sums) { case (acc, (_, d, v)) =>
        acc + (d -> (acc.getOrElse(d, 0.0) + v))
      }
    val days = sums.keys.toIndexedSeq.sorted
    val closed = days.dropRight(1) // max day may still accumulate
    val toEmit = closed.filterNot(prev.emitted)
    // emissions are computed BEFORE eviction, so frames see the full
    // retained history
    val out = toEmit.map { d =>
      val i = closed.indexOf(d)
      val frame = closed.slice(math.max(0, i - frameDays), i).map(sums)
      DailyFeatures(id, d, sums(d),
        if (i >= 1) Some(sums(closed(i - 1))) else None,
        if (frame.nonEmpty) Some(frame.sum / frame.size) else None,
        if (frame.nonEmpty) Some(frame.sum) else None)
    }
    val keep = days.takeRight(frameDays + 1).toSet
    // watermark advances to the oldest retained day only when something was
    // actually evicted this round (monotone — eviction is irreversible)
    val wm =
      if (days.size > keep.size) Seq(prev.watermark, keep.min).max
      else prev.watermark
    (DayState(sums.view.filterKeys(keep).toMap,
      (prev.emitted ++ toEmit).filter(keep), wm), out)
  }

  /** W1/W2/W4 as STREAMING state (`flatMapGroupsWithState`) — the hard
    * migration SURVEY.md §2.10 flags: per-user daily totals accumulate in
    * state; a day becomes immutable ("closed") once a later day appears for
    * that user, at which point its lag/rolling features emit exactly once.
    * Trailing ROWS frames over closed days reproduce the batch semantics
    * (current row excluded) for in-order data. State is bounded by the
    * eviction policy in [[advanceDayState]].
    */
  def streamingDailyFeatures(spark: SparkSession, events: DataFrame,
                             frameDays: Int = 7): Dataset[DailyFeatures] = {
    import spark.implicits._
    events
      .selectExpr("user_id", "cast(cast(ts as date) as string) as date", "value")
      .as[(Long, String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (id: Long, rows: Iterator[(Long, String, Double)],
         state: org.apache.spark.sql.streaming.GroupState[DayState]) =>
          val prev = state.getOption.getOrElse(DayState(Map.empty, Set.empty))
          val (next, out) = advanceDayState(id, prev, rows, frameDays)
          state.update(next)
          out.iterator
      }
  }

  /** Streaming exact-dedup — the streaming twin of
    * [[graft.ext.Dedup.exactGroups]]: drop events whose `keyCols` were
    * already seen, with the dedup state BOUNDED by the event-time
    * watermark (`dropDuplicatesWithinWatermark`: duplicates arriving
    * within the watermark window are guaranteed dropped, state for older
    * keys is reclaimed — unbounded-state dropDuplicates is the same
    * state-store killer the day-feature eviction guards against).
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  tsCol: String = "ts",
                  watermark: String = "2 hours"): DataFrame =
    events
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-static join: flag stream readings against a precomputed static
    * per-user profile (mean/std). The static side broadcasts, so each
    * micro-batch is a map-only pass — which assumes the profile fits in
    * executor memory. For an unbounded profile (per-user at full scale)
    * drop the `broadcast` hint and accept a per-batch shuffled join.
    */
  def flagAgainstProfile(events: DataFrame, profile: DataFrame,
                         idCol: String = "user_id",
                         valueCol: String = "value",
                         z: Double = 3.0): DataFrame =
    events.join(broadcast(profile), Seq(idCol), "left")
      .withColumn("z_score",
        (col(valueCol) - col("profile_mean")) /
          when(col("profile_std") > 0, col("profile_std")).otherwise(lit(1.0)))
      // never-seen users can't be scored: is_scored=0 and an explicit 0/1
      // flag (a null flag would silently vanish from downstream counts)
      .withColumn("is_scored", col("profile_mean").isNotNull.cast("int"))
      .withColumn("is_anomaly",
        coalesce((abs(col("z_score")) > z).cast("int"), lit(0)))

  /** Stream-stream interval join: each purchase joins the SAME user's view
    * events from the preceding `windowMinutes`. Both sides are watermarked
    * and the join condition bounds event-time distance in both directions,
    * so the state store provably evicts: a buffered view is droppable once
    * the purchase-side watermark passes `v_ts + windowMinutes` (without
    * the interval bound, each side would buffer forever — the
    * stream-stream analogue of the unbounded-dedup state killer).
    * Inner join: purchases with no prior view emit nothing, matching the
    * batch attribution twin in the spec.
    */
  def clickAttribution(events: DataFrame, windowMinutes: Int = 30,
                       watermark: String = "1 hour"): DataFrame = {
    val ts = col("ts").cast("timestamp")
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), ts.as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), ts.as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", watermark)
    purchases.join(views,
      col("p_user") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("v_ts") < col("p_ts"))
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("view_id"), col("p_ts"), col("v_ts"), col("value"))
  }

  /** Streaming upsert sink via `foreachBatch` — the production pattern for
    * materializing a streaming aggregate into a keyed store: the update-
    * mode daily rollup emits refreshed (user, date) partials each
    * micro-batch, and the batch callback folds them into a parquet state
    * directory with NEWEST-WINS merge semantics (left-anti out the
    * refreshed keys, union the new partials). Writes go to a staging dir
    * and swap in via FileSystem.rename — overwriting the directory the
    * merge just read would corrupt it mid-job. At warehouse scale the
    * rename-swap becomes a Delta/Iceberg MERGE INTO; the batch-side logic
    * is identical.
    *
    * Decimal partials keep the upserted sums bit-identical to a batch
    * recompute (order-independence across micro-batches).
    */
  def dailyUpsertSink(events: DataFrame, outDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val agg = events
      .select(col("user_id"), to_date(col("ts")).as("date"), col("value"))
      .groupBy(col("user_id"), col("date"))
      .agg(sum(col("value").cast(
          org.apache.spark.sql.types.DataTypes.createDecimalType(18, 4)))
        .as("dsum"),
        count(lit(1)).as("n"))
    agg.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val conf = s.sparkContext.hadoopConfiguration
        val out = new org.apache.hadoop.fs.Path(outDir)
        val fs = out.getFileSystem(conf)
        // staging derives from the NORMALIZED path — raw string concat on a
        // trailing-slash outDir would nest staging inside the live store,
        // and the swap would delete both
        val staging = new org.apache.hadoop.fs.Path(
          out.getParent, out.getName + ".staging")
        // recover an interrupted swap. "out exists" does NOT mean "out is
        // intact": a crash mid-delete(out) (recursive deletes are
        // file-by-file) leaves a PARTIAL out beside a complete staging.
        // The _SUCCESS marker is the completeness signal: a complete
        // staging is always the newest full state (the replayed batch
        // re-merges idempotently via the left-anti), so finish its swap;
        // a marker-less staging is a torn write — drop it.
        val stagingComplete = fs.exists(
          new org.apache.hadoop.fs.Path(staging, "_SUCCESS"))
        if (stagingComplete) {
          if (fs.exists(out) && !fs.delete(out, true))
            throw new java.io.IOException(s"recovery delete $out failed")
          if (!fs.rename(staging, out))
            throw new java.io.IOException(
              s"recovery rename $staging -> $out failed")
        } else if (fs.exists(staging)) fs.delete(staging, true)
        val merged =
          if (fs.exists(out)) {
            // null-safe key equality: a null date (null ts upstream) is a
            // legitimate group the stream re-emits; EqualTo would keep the
            // stale row AND union the refreshed one, duplicating per batch
            val existing = s.read.parquet(out.toString).alias("e")
            existing.join(batch.alias("b"),
                col("e.user_id") <=> col("b.user_id") &&
                  col("e.date") <=> col("b.date"), "left_anti")
              .unionByName(batch)
          } else batch
        merged.write.mode("overwrite").parquet(staging.toString)
        // a silently failed delete would make rename nest staging INSIDE
        // the still-existing out (Hadoop rename-onto-directory semantics)
        // and report success over stale data
        if (fs.exists(out) && !fs.delete(out, true))
          throw new java.io.IOException(s"delete $out failed")
        if (!fs.rename(staging, out))
          throw new java.io.IOException(s"rename $staging -> $out failed")
      }
      .start()
  }
}
