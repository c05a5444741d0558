package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter runtime pre-filtering for selective fact⋈dim joins.
  *
  * The pattern Spark's own `InjectRuntimeFilter` applies when statistics
  * allow, exposed as an explicit operator: build a Bloom filter over the
  * (already filtered, therefore small) build side's join keys, broadcast it,
  * and drop non-matching probe rows BEFORE the join's shuffle. At 100 TB the
  * exchange is the cost center — a 1% selective dim filter means ~99% of the
  * fact table's shuffle write is wasted bytes unless something prunes it
  * scan-side. The Bloom filter is that something: fixed memory (`fpp` vs
  * bits tradeoff), no false negatives, and false positives are eliminated by
  * the exact join that follows, so the composition is semantically
  * invisible — which is exactly what the DuckDB oracle checks (plain join,
  * no bloom).
  *
  * `DataFrameStatFunctions.bloomFilter` builds the sketch with a distributed
  * `treeAggregate`; the probe is Catalyst's own `BloomFilterMightContain`
  * expression (the same one `InjectRuntimeFilter` plants) over the serialized
  * sketch as a binary literal — fully codegen'd, no per-row boxing, and the
  * whole predicate stays inside the scan's WholeStageCodegen span. The
  * literal ships with the serialized plan exactly like the scalar-subquery
  * result in Spark's native rule does, so task-side cost is identical.
  */
object RuntimeFilter {

  /** Inner-join `fact` to `dim`, pre-pruning `fact` with a Bloom filter of
    * `dim`'s keys. `expectedItems` sizes the sketch (use the dim-side
    * cardinality estimate; at warehouse scale this comes from table stats —
    * here callers may pass `dim.count()` since the build side is small by
    * contract).
    *
    * Both key columns must be LongType (TPC-H-style surrogate keys).
    */
  def bloomInnerJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame =
    bloomPrune(fact, dim, factKey, dimKey, expectedItems, fpp)
      .join(dim, col(factKey) === col(dimKey))

  /** The pruned-fact frame alone (no join) — for callers composing their own
    * join or aggregation after the runtime filter. False positives remain;
    * only follow with an exact semi/inner join or tolerate the `fpp`.
    *
    * An empty `dim` legitimately means "nothing can match" (and the
    * convention of passing `expectedItems = dim.count()` then yields 0), so
    * the empty short-circuit runs BEFORE the sizing requires: callers with a
    * fully-filtered-out build side get an empty result, not an exception.
    * Spark's `stat.bloomFilter` would NPE on that case anyway (the aggregate
    * returns a null sketch buffer). The isEmpty probe is a limit-1 job on
    * the (small by contract) dim.
    */
  def bloomPrune(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    if (dim.isEmpty) return fact.filter(lit(false))
    require(expectedItems > 0, s"expectedItems=$expectedItems must be positive")
    require(fpp > 0 && fpp < 1, s"fpp=$fpp must be in (0, 1)")
    val bf = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bytes = {
      val out = new java.io.ByteArrayOutputStream()
      bf.writeTo(out)
      out.toByteArray
    }
    // Same null semantics as the join that follows: a null probe key yields
    // a null predicate, which filter() drops.
    val mightContain = ColumnBridge.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      ColumnBridge.expression(col(factKey))))
    fact.filter(mightContain)
  }
}
