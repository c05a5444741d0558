package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multi-dimensional layout helpers: the Z-order (Morton) interleave that
  * backs `OPTIMIZE ZORDER BY`-style clustered writes.
  *
  * Why it matters at 100 TB: [[graft.io.Writers.rangeSortedParquet]] gives
  * perfect skipping on ONE sort key but nothing on the second; a Z-value
  * sort gives every interleaved dimension bounded min/max ranges inside
  * each file, so parquet footer stats prune files for predicates on ANY of
  * the dimensions. The curve is computed as a pure integer expression —
  * codegen'd arithmetic, no UDF, reproducible in any engine.
  */
object Layout {

  /** Interleave the low `bits` bits of `x` (even positions) and `y` (odd
    * positions) into a single Z-value. Inputs must be non-negative and fit
    * in `bits` bits — higher bits are masked off, which keeps the
    * expression total (no overflow path) at the cost of wrapping
    * out-of-range coordinates; callers bucket/clamp their dims first.
    *
    * The per-bit terms occupy disjoint bit positions, so `+` is exactly
    * bitwise OR — summed (not OR-folded) because `+` round-trips through
    * any SQL oracle without operator-precedence surprises.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits=$bits must be in [1, 31]")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** SQL twin of [[zValue]] — generates the identical bit-arithmetic for a
    * DuckDB/ANSI oracle (`>>`, `&`, `<<` all parenthesized, joined by `+`).
    */
  def zValueSql(x: String, y: String, bits: Int): String = {
    require(bits > 0 && bits <= 31, s"bits=$bits must be in [1, 31]")
    (0 until bits).flatMap { i =>
      Seq(
        s"((((($x) >> $i) & 1)) << ${2 * i})",
        s"((((($y) >> $i) & 1)) << ${2 * i + 1})")
    }.mkString("(", " + ", ")")
  }
}
