package graft.ext

import scala.collection.mutable.ArrayBuffer
import scala.util.control.NonFatal

import org.apache.spark.sql.DataFrame

/** Scoped lifecycle for operator-internal caches.
  *
  * The `ext/` operators cache small internal frames (shingle sets, MinHash
  * signatures, candidate pairs) that several plan branches consume. Their
  * default lifecycle is session-LRU: entries stay registered until storage
  * pressure evicts them — right for a bench run that clears between
  * queries, but an unbounded-growth vector for a long-lived session
  * processing many corpora (100 TB = thousands of dedup passes against one
  * SparkSession).
  *
  * `CacheScope.scoped { ... }` bounds that: every internal cache an
  * operator registers while the scope is open is unpersisted when the
  * scope closes — after the caller has materialized its results:
  *
  * {{{
  * val keepers = CacheScope.scoped {
  *   Dedup.minHashVerified(corpus, "text", "doc_id").collect()
  * } // shingle/signature/candidate caches released here
  * }}}
  *
  * Results must be MATERIALIZED inside the scope (collect/count/write): a
  * lazy DataFrame escaping the scope stays correct — unpersist never
  * changes results — but recomputes the formerly-cached branches on its
  * next action.
  *
  * Scopes nest: an inner scope releases only its own registrations.
  * Spark's cache registry is keyed by LOGICAL PLAN, not by registration —
  * caching the same plan twice is one entry, and unpersisting it once
  * removes it for everyone — so the inner exit SKIPS any plan an
  * enclosing scope also registered (matched with `sameResult` on the
  * analyzed plans); the owning outer scope releases it at its own exit.
  * Registration is driver-side at plan-construction time (operators build
  * plans on the calling thread), so a ThreadLocal carries the scope
  * stack; code outside any scope keeps the session-LRU default.
  */
object CacheScope {

  /** Innermost-first stack of open scopes on this thread. */
  private val active = new ThreadLocal[List[ArrayBuffer[DataFrame]]] {
    override def initialValue(): List[ArrayBuffer[DataFrame]] = Nil
  }

  /** `df.cache()` + registration with the innermost open scope on this
    * thread (plain session-lifetime cache when none). All `ext/` internal
    * caches route through here.
    */
  private[graft] def cache(df: DataFrame): DataFrame = {
    df.cache()
    active.get() match {
      case buf :: _ => buf += df
      case Nil => ()
    }
    df
  }

  /** `.scopedCache()` — drop-in for `.cache()` in operator chains; routes
    * through [[CacheScope.cache]] so an open scope owns the entry.
    */
  implicit final class Cacheable(private val df: DataFrame) extends AnyVal {
    def scopedCache(): DataFrame = CacheScope.cache(df)
  }

  /** Run `body`; unpersist every cache registered during it on exit
    * (including on exception) — except plans an enclosing scope also
    * registered, which stay cached until that scope closes. Returns
    * `body`'s result.
    */
  def scoped[T](body: => T): T = {
    val buf = new ArrayBuffer[DataFrame]
    active.set(buf :: active.get())
    try body
    finally {
      val outers = active.get().tail
      active.set(outers)
      // blocking=false: eviction proceeds async, same as Dataset.unpersist's
      // default; double-unpersist (operators that already release their own
      // short-lived caches) is a no-op
      buf.foreach { df =>
        val ownedByOuter = outers.exists(_.exists(o =>
          o.queryExecution.analyzed.sameResult(df.queryExecution.analyzed)))
        if (!ownedByOuter) {
          try df.unpersist()
          catch { case NonFatal(_) => () }
        }
      }
    }
  }
}
