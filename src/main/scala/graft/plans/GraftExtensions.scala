package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSim, DotProduct}

/** Session extension exposing graft's native expressions to SQL users:
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   spark.sql("SELECT graft_dot(a, b) FROM vectors")
  * }}}
  * (registered via `injectFunction`, the supported extension point — no
  * internal registry poking).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(e.injectFunction)
    e.injectOptimizerRule(SpreadGenerate) // opt-in: spark.graft.spread.enabled
  }
}

object GraftExtensions {
  private val functions = Seq(
    (new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))
        : Expression),
    (new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => CosineSim(exprs.head, exprs(1))
        : Expression))

  /** Register directly on an EXISTING session — `getOrCreate` silently
    * ignores `withExtensions` when it returns a pre-existing session, so
    * [[graft.Engine.session]] calls this to make registration
    * unconditional.
    */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    // injectOptimizerRule only applies at session CREATION; a reused
    // session gets the (still conf-gated) rule via the public
    // experimental-optimizations hook instead
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[SpreadGenerate]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SpreadGenerate(spark)
  }
}
