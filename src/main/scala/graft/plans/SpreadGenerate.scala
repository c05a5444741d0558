package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Optimizer rule: widen under-split scans beneath generators.
  *
  * The Catalyst-rule form of [[graft.ext.Spread.cpu]], for SQL-first users
  * who never touch the DataFrame API: parquet splits are sized by BYTES,
  * so a small file scans as one task and an `explode`/`posexplode` rooted
  * on it — shingling, token fan-out — runs single-threaded no matter the
  * cluster size (measured 7× on the MinHash signature stage at sf0.1).
  * When a [[Generate]] sits on a narrow chain (project/filter only) over a
  * file scan whose estimated split count is below the default parallelism,
  * insert a shuffled [[Repartition]] between scan and generator.
  *
  * Opt-in via `spark.graft.spread.enabled=true`: a rule that inserts
  * exchanges changes plan shapes, which callers asserting on plans must
  * choose deliberately. Semantics are unaffected (repartition is
  * row-preserving; generator output order is not part of any contract —
  * every graft query orders its output explicitly).
  *
  * Fires at most once per generator chain: the inserted Repartition makes
  * the child non-narrow on the next pass, and stacked generators only
  * widen at the innermost (the outer ones inherit the repartitioned
  * distribution).
  */
case class SpreadGenerate(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!session.conf.get("spark.graft.spread.enabled", "false")
        .equalsIgnoreCase("true")) // lenient: a typo'd value must not make
      plan                         // every query in the session unplannable
    else {
      val target = session.sparkContext.defaultParallelism
      plan.transformUp {
        case g: Generate if estimatedSplits(g.child).exists(_ < target) =>
          g.copy(child = Repartition(target, shuffle = true, g.child))
      }
    }

  /** Split estimate for a narrow (project/filter/alias-only) chain over a
    * single file relation; None ⇒ not narrow / not a file scan / already
    * repartitioned ⇒ never fire.
    */
  private def estimatedSplits(p: LogicalPlan): Option[Long] = p match {
    case Project(_, c)       => estimatedSplits(c)
    case Filter(_, c)        => estimatedSplits(c)
    case SubqueryAlias(_, c) => estimatedSplits(c)
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: HadoopFsRelation =>
          val maxSplit = session.sessionState.conf.filesMaxPartitionBytes
          Some(math.max(1L, (fs.sizeInBytes + maxSplit - 1) / maxSplit))
        case _ => None
      }
    case _ => None
  }
}
