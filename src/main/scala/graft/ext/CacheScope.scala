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
  *
  * THREADING: the stack is deliberately NOT an InheritableThreadLocal —
  * pool threads are created once and reused, so creation-time inheritance
  * would hand a pool thread whatever scope happened to be open when the
  * pool grew, forever (a stale-ownership bug worse than the gap it
  * closes). Instead, a plan built on a worker thread while a scope is
  * open elsewhere falls back to session-LRU and logs a warning; the
  * deliberate cross-thread pattern takes a [[handle]] on the owning
  * thread and wraps the worker body in [[adopt]]:
  *
  * {{{
  * CacheScope.scoped {
  *   val h = CacheScope.handle()
  *   val fits = Future { CacheScope.adopt(h) { buildAndRun(...) } }
  *   Await.result(fits, timeout) // adopt must complete before scope exit
  * }
  * }}}
  */
object CacheScope {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Innermost-first stack of open scopes on this thread. */
  private val active = new ThreadLocal[List[ArrayBuffer[DataFrame]]] {
    override def initialValue(): List[ArrayBuffer[DataFrame]] = Nil
  }

  /** Open scopes across ALL threads — the cross-thread-gap detector. */
  private val openScopes = new java.util.concurrent.atomic.AtomicInteger(0)

  /** `df.cache()` + registration with the innermost open scope on this
    * thread (plain session-lifetime cache when none). All `ext/` internal
    * caches route through here. Buffer appends synchronize because
    * [[adopt]] lets several threads share one scope's buffer.
    */
  private[graft] def cache(df: DataFrame): DataFrame = {
    df.cache()
    active.get() match {
      case buf :: _ => buf.synchronized { buf += df }
      case Nil =>
        if (openScopes.get() > 0)
          log.warn("CacheScope: cache registered on a thread with no open " +
            "scope while a scope is open elsewhere — the plan was likely " +
            "built on a pool thread, so this cache falls back to the " +
            "session-LRU lifecycle. For scope-owned cross-thread work, " +
            "take CacheScope.handle() on the owning thread and wrap the " +
            "worker body in CacheScope.adopt(handle) { ... }.")
    }
    df
  }

  /** Opaque reference to the innermost open scope on the calling thread,
    * for deliberate cross-thread registration via [[adopt]]. `None` when
    * no scope is open (adopt of `None` is a no-op pass-through).
    */
  final class Handle private[CacheScope] (
      private[CacheScope] val frames: ArrayBuffer[DataFrame])

  def handle(): Option[Handle] =
    active.get().headOption.map(new Handle(_))

  /** Run `body` on the CURRENT thread with `h`'s scope installed as the
    * innermost scope, so `scopedCache()` calls inside register with the
    * scope that produced the handle. The handle's scope must still be
    * open when `body`'s caches register (await worker completion before
    * the owning scope exits — a scope that closed mid-body simply won't
    * release the late registrations until... never; same contract as any
    * escaped lazy frame).
    */
  def adopt[T](h: Option[Handle])(body: => T): T = h match {
    case None => body
    case Some(handle) =>
      active.set(handle.frames :: active.get())
      try body
      finally active.set(active.get().tail)
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
    openScopes.incrementAndGet()
    try body
    finally {
      openScopes.decrementAndGet()
      val outers = active.get().tail
      active.set(outers)
      // blocking=false: eviction proceeds async, same as Dataset.unpersist's
      // default; double-unpersist (operators that already release their own
      // short-lived caches) is a no-op. Snapshot under the buffer lock —
      // an adopt()ed worker may still be appending (contract violation,
      // but tearing a concurrent append must not corrupt the walk).
      val snapshot = buf.synchronized { buf.toList }
      snapshot.foreach { df =>
        val ownedByOuter = outers.exists(outer =>
          outer.synchronized { outer.toList }.exists(o =>
            o.queryExecution.analyzed.sameResult(df.queryExecution.analyzed)))
        if (!ownedByOuter) {
          try df.unpersist()
          catch { case NonFatal(_) => () }
        }
      }
    }
  }
}
