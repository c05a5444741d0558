package graft.tools

/** Process-wide phase-timing registry: operators wrap their internal
  * phases (`PhaseTimer.timed("anomaly.kmeans_fit") { ... }`) and Bench
  * surfaces the accumulated seconds in BENCH_DETAIL.json — the
  * adjudication hook for queries whose wall time bounces across rounds
  * with no code change (q_ml_anomaly moved 17→21→25 s over three rounds;
  * per-phase timings decide variance-vs-regression PER PHASE instead of
  * arguing about one opaque total).
  *
  * Semantics: values are SUMS of wall-clock seconds across all
  * invocations since [[clear]] — phases that run concurrently (the
  * forecast model families train in parallel) each accumulate their own
  * thread's wall time, so phase sums can legitimately exceed the fused
  * query's wall clock. Zero overhead when nothing reads the snapshot;
  * never consulted by any query result.
  */
object PhaseTimer {
  private val acc =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  def timed[A](name: String)(body: => A): A = {
    val t0 = System.nanoTime()
    try body
    finally acc.merge(name, (System.nanoTime() - t0) / 1e9,
      (a, b) => java.lang.Double.valueOf(a.doubleValue + b.doubleValue))
  }

  def snapshot: Map[String, Double] = {
    val b = Map.newBuilder[String, Double]
    acc.forEach((k, v) => b += k -> v.doubleValue)
    b.result()
  }

  def clear(): Unit = acc.clear()
}
