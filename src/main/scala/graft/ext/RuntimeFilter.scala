package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  * Public API only: `DataFrameStatFunctions.bloomFilter` builds the sketch
  * with a distributed `treeAggregate`; the probe side evaluates a broadcast
  * `mightContainLong` per row. The probe predicate is a Scala UDF (the
  * codegen'd `BloomFilterMightContain` expression is internal to Catalyst's
  * runtime-filter rule and not registered publicly); the UDF sits directly
  * on top of the scan, narrow, and costs far less than the shuffle bytes it
  * saves.
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
    */
  def bloomPrune(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    require(expectedItems > 0, s"expectedItems=$expectedItems must be positive")
    require(fpp > 0 && fpp < 1, s"fpp=$fpp must be in (0, 1)")
    // Spark's stat.bloomFilter NPEs on an EMPTY build side (the aggregate
    // returns a null sketch buffer); an empty dim legitimately means
    // "nothing can match" — short-circuit with a false predicate. The
    // isEmpty probe is a limit-1 job on the (small by contract) dim.
    if (dim.isEmpty) return fact.filter(lit(false))
    val bf = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bcast = fact.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bcast.value.mightContainLong(k))
    fact.filter(mightContain(col(factKey)))
  }
}
