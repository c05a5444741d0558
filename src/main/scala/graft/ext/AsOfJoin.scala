package graft.ext

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join — for each left row, the latest right row with
  * `rightTime <= leftTime` within the same key group. Spark has no as-of
  * operator; per the preference order (SURVEY.md §7.3) this composes
  * built-ins rather than adding a plan node: tag both sides, union, and run
  * `last(_, ignoreNulls)` over a (key, time)-sorted window — right rows act
  * as state updates that the next left rows observe.
  *
  * Scale: exactly one shuffle (by key) + per-partition sort — the same cost
  * envelope as a sort-merge join, no point-in-time subquery per row. Ties
  * (`rightTime == leftTime`) sort right-before-left, so a same-instant
  * right row IS visible, matching `ON r.t <= l.t` semantics (and DuckDB's
  * ASOF JOIN, the test oracle).
  */
object AsOfJoin {

  /** @param payload right-side columns to carry to the left rows (renamed
    *                as given in the map: rightCol -> outputName).
    */
  def leftAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               payload: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // internal slot names — a user column with one of these names would be
    // silently overwritten by the withColumns below, corrupting the result
    val reserved = Seq("__t", "__src", "__upd", "__upd_f")
    val clash = (left.columns ++ right.columns).filter(reserved.contains)
    require(clash.isEmpty,
      s"leftAsOf: input columns ${clash.mkString(", ")} collide with " +
        "reserved internal names (__t, __src, __upd, __upd_f) — rename them")
    val srcL = left
      .withColumn("__t", col(leftTime))
      .withColumn("__src", lit(1))
    // payload travels as ONE struct per right row: the struct is non-null
    // even when its fields are null, so `last(_, ignoreNulls)` matches the
    // latest right ROW — a null payload VALUE on the latest row is
    // faithfully returned as null (DuckDB ASOF semantics), not skipped in
    // favor of an older non-null value
    val srcR0 = right.select(
      (keys.map(col) :+ col(rightTime).as("__t")) :+
        struct(payload.map { case (c, out) => col(c).as(out) }.toSeq: _*)
          .as("__upd"): _*)
      .withColumn("__src", lit(0))
    val withPayloadSlots = srcL.withColumn("__upd",
      lit(null).cast(srcR0.schema("__upd").dataType))
    val leftOnly = leftCols.filterNot(c => keys.contains(c))
    val alignedR = leftOnly.foldLeft(srcR0)((d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select(withPayloadSlots.columns.map(col): _*)
    val unioned = withPayloadSlots.union(alignedR)
    // right rows sort before left rows at equal time → same-instant updates
    // are visible to the left row. The trailing __upd sort key makes ties
    // among IDENTICAL (key, time) right rows deterministic: last() then
    // resolves to the greatest payload struct instead of whichever row the
    // shuffle happened to order last. Only added when the payload type IS
    // orderable — a map-bearing payload would otherwise fail analysis, and
    // for such payloads same-instant duplicate resolution stays
    // order-undefined (documented, not a crash).
    val updOrderable = org.apache.spark.sql.catalyst.expressions.RowOrdering
      .isOrderable(srcR0.schema("__upd").dataType)
    val sortKeys = Seq(col("__t").asc, col("__src").asc) ++
      (if (updOrderable) Seq(col("__upd").asc_nulls_first) else Nil)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(sortKeys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__upd_f",
      last(col("__upd"), ignoreNulls = true).over(w))
    filled.filter(col("__src") === 1)
      .select(leftCols.map(col) ++
        payload.values.map(out => col(s"__upd_f.$out").as(out)): _*)
  }

  /** FORWARD as-of join — for each left row, the EARLIEST right row with
    * `rightTime >= leftTime` (same key): "the next reading after this
    * event". Mirror of [[leftAsOf]]: same union + one shuffle + one sort,
    * but the fill runs `first(_, ignoreNulls)` over the FORWARD frame, and
    * at equal times left rows sort before right rows so a same-instant
    * right row IS visible (`r.t >= l.t` inclusive). Same-instant duplicate
    * right rows resolve to the greatest orderable payload — the same
    * deterministic choice [[leftAsOf]] makes.
    */
  def leftAsOfForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTime: String, rightTime: String,
                      payload: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val reserved = Seq("__t", "__src", "__upd", "__upd_f")
    val clash = (left.columns ++ right.columns).filter(reserved.contains)
    require(clash.isEmpty,
      s"leftAsOfForward: input columns ${clash.mkString(", ")} collide " +
        "with reserved internal names (__t, __src, __upd, __upd_f)")
    val srcL = left
      .withColumn("__t", col(leftTime))
      .withColumn("__src", lit(1))
    val srcR0 = right.select(
      (keys.map(col) :+ col(rightTime).as("__t")) :+
        struct(payload.map { case (c, out) => col(c).as(out) }.toSeq: _*)
          .as("__upd"): _*)
      .withColumn("__src", lit(0))
    val withPayloadSlots = srcL.withColumn("__upd",
      lit(null).cast(srcR0.schema("__upd").dataType))
    val leftOnly = leftCols.filterNot(c => keys.contains(c))
    val alignedR = leftOnly.foldLeft(srcR0)((d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select(withPayloadSlots.columns.map(col): _*)
    val unioned = withPayloadSlots.union(alignedR)
    val updOrderable = org.apache.spark.sql.catalyst.expressions.RowOrdering
      .isOrderable(srcR0.schema("__upd").dataType)
    // left (__src=1) before right (__src=0) at equal __t → the frame
    // starting at the left row includes same-instant rights; among
    // identical (key, time) rights, desc payload makes first() = greatest
    val sortKeys = Seq(col("__t").asc, col("__src").desc) ++
      (if (updOrderable) Seq(col("__upd").desc_nulls_last) else Nil)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(sortKeys: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = unioned.withColumn("__upd_f",
      first(col("__upd"), ignoreNulls = true).over(w))
    filled.filter(col("__src") === 1)
      .select(leftCols.map(col) ++
        payload.values.map(out => col(s"__upd_f.$out").as(out)): _*)
  }

  /** Range join: left rows matched to right intervals [startCol, endCol)
    * sharing `keys`. Composed as an equi-join on keys + interval predicate;
    * Catalyst evaluates the range predicate post-join, and the equi-key
    * keeps the shuffle bounded (never a cross product).
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                leftTime: String, start: String, end: String,
                how: String = "inner"): DataFrame = {
    val cond = keys.map(k => left(k) === right(k)).reduce(_ && _) &&
      left(leftTime) >= right(start) && left(leftTime) < right(end)
    val joined = left.join(right, cond, how)
    keys.foldLeft(joined)((d, k) => d.drop(right(k)))
  }
}
