package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ext.CacheScope.Cacheable

/** Mergeable frequency sketches. Count-min here: a fixed `depth × width`
  * grid of counters where cell (r, h_r(k)) accumulates every occurrence of
  * key k, and the estimate for k is the MIN over its `depth` cells — an
  * overestimate, never an under-estimate (collisions only add).
  *
  * Scale design: the sketch is O(depth·width) rows regardless of input
  * size — it aggregates with map-side combine (the groupBy on (r, b)
  * carries pre-summed cells out of every partition) and merges across
  * corpora by summing cells, which is how a 1000-executor job keeps a
  * global heavy-hitter view without ever shuffling raw keys. Hashes are
  * the engine-portable [[Dedup.tokenHash]] family (salted per row) so a
  * SQL oracle reproduces every cell bit-exactly; `xxhash64` is the faster
  * non-oracled drop-in.
  */
object Sketches {

  /** Row-`r` bucket of `key` in a width-`width` sketch. */
  def cmBucket(key: Column, r: Int, width: Int): Column =
    pmod(Dedup.tokenHash(concat(lit(s"cm$r:"), key.cast("string"))),
      lit(width.toLong))

  private def bucketStructs(key: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(r =>
      struct(lit(r).as("r"), cmBucket(key, r, width).as("b"))): _*)

  /** Build the sketch from pre-aggregated (key, count) rows: one explode
    * to `depth` (r, b) rows per key, one partial-aggregating groupBy.
    * Feeding pre-aggregated counts (not raw events) keeps the explode
    * proportional to distinct keys — at 100 TB the exact per-key pre-agg
    * is itself one map-side-combining shuffle of tiny rows.
    */
  def countMinSketch(counts: DataFrame, keyCol: String, cntCol: String,
                     depth: Int = 4, width: Int = 64): DataFrame = {
    require(depth > 0 && width > 0, s"depth=$depth width=$width must be > 0")
    counts
      .select(col(cntCol).as("__c"),
        explode(bucketStructs(col(keyCol), depth, width)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(sum(col("__c")).as("cell"))
  }

  /** Point estimates for every key in `keys`: explode each key to its
    * `depth` (r, b) coordinates, equi-join the sketch, take the min cell.
    * The sketch is depth·width rows — broadcast-sized by construction, so
    * the join never shuffles the key side.
    */
  def countMinEstimates(sketch: DataFrame, keys: DataFrame, keyCol: String,
                        depth: Int = 4, width: Int = 64): DataFrame = {
    val passThrough = keys.columns.map(col)
    keys
      .select(passThrough :+
        explode(bucketStructs(col(keyCol), depth, width)).as("rb"): _*)
      .select(passThrough :+ col("rb.r").as("r") :+ col("rb.b").as("b"): _*)
      .join(broadcast(sketch), Seq("r", "b"))
      .groupBy(keys.columns.map(col): _*)
      .agg(min(col("cell")).as("est"))
  }

  /** Per-day DataSketches HLL sketches of the id column — the mergeable
    * distinct-count state a 100 TB engine keeps PER DAY so any trailing
    * window is a register-wise union of ≤ `window` fixed-size sketches,
    * never a rescan of raw ids. One map-side-combining shuffle of
    * (day, sketch) rows; raw ids cross no further exchange.
    */
  def dailyIdSketches(events: DataFrame, idCol: String, tsCol: String)
      : DataFrame =
    events.select(to_date(col(tsCol)).as("d"), col(idCol).as("__id"))
      .groupBy(col("d"))
      .agg(hll_sketch_agg(col("__id")).as("sk"))

  /** Approximate trailing-`windowDays` distinct actives per day — the
    * documented scale swap for the exact `q_rolling_actives`: identical
    * calendar-join shape (each per-day sketch fans out to ≤ `windowDays`
    * calendar rows, the calendar side broadcasts), but the merge is
    * `hll_union_agg` over fixed-size sketches instead of an exact
    * distinct over (user, day) rows — per-day state is O(2^lgK) bytes
    * regardless of cardinality. The estimate is DETERMINISTIC (HLL has
    * no RNG; the union is register-wise max, order-independent) but not
    * exact, so this op is spec-verified against the exact twin
    * (SketchesSpec: ≤ 5% relative error, merge ≡ direct sketch) instead
    * of DuckDB-oracled — DuckDB's approx_count_distinct uses a
    * different HLL implementation and cannot hash-match.
    */
  def rollingActivesHll(events: DataFrame, idCol: String, tsCol: String,
                        windowDays: Int = 7): DataFrame = {
    require(windowDays > 0, s"windowDays=$windowDays must be positive")
    // cache: BOTH join sides derive from perDay (the calendar branch
    // column-prunes to a distinct-dates aggregate, so nothing reuses the
    // probe side's exchange) — uncached, each side would rescan the raw
    // events table end-to-end. One tiny row per day; session-lifetime
    // cache contract as elsewhere in ext/.
    val perDay = dailyIdSketches(events, idCol, tsCol).scopedCache()
    val cal = perDay.select(col("d").as("cal_d"))
    perDay.join(broadcast(cal),
        col("cal_d") >= col("d") &&
          col("cal_d") < date_add(col("d"), windowDays))
      .groupBy(col("cal_d").as("d"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
        .as("approx_actives"))
      .orderBy(col("d"))
  }
}
