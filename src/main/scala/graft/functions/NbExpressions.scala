package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Serve-time Naive-Bayes margin over a token array: one hash-map lookup
  * per token occurrence, folded in index order, plus the class prior,
  * guard-rounded to 6dp — the codegen'd replacement for
  * [[graft.ext.NbClassifier.scoreLocal]]'s interpreted
  * `aggregate(toks, …, element_at(mapLit, t))` HOF stack, which paid a
  * boxed lambda per element AND a LINEAR scan of the map literal per
  * lookup (`GetMapValue` on an array-backed literal is O(|vocab|) — the
  * exact hot-path trap `SignBits` documents, squared by vocabulary size).
  * The weight map ships once as a reference object hashed by
  * `UTF8String`; the generated loop is one O(1) probe per token.
  *
  * Arithmetic contract: identical to the HOF form it replaces —
  * per-occurrence adds in array-index order from 0.0, `+ prior`,
  * `+ 1e-9`, HALF_UP to 6dp (Spark `round` semantics) — so margins are
  * bit-identical and `q_nb_serve`'s oracle is untouched. Null iff the
  * array is null or any element is null.
  */
case class NbMargin(child: Expression, weights: Map[String, Double],
                    floorW: Double, prior: Double)
    extends UnaryExpression {

  // content-comparable params for canonicalization (same rationale as
  // SignBits); the serve-time hash index is a transient mirror
  @transient private lazy val lookup: java.util.HashMap[UTF8String, java.lang.Double] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Double](
      math.max(16, weights.size * 2))
    weights.foreach { case (k, v) =>
      m.put(UTF8String.fromString(k), java.lang.Double.valueOf(v))
    }
    m
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nb_margin requires an array<string> input, got " +
        other.simpleString)
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_nb_margin"
  override def nullable: Boolean = true

  private def round6(raw: Double): Double =
    if (raw.isNaN || raw.isInfinite) raw
    else java.math.BigDecimal.valueOf(raw)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val w = lookup.get(x.getUTF8String(i))
      acc += (if (w == null) floorW else w.doubleValue())
      i += 1
    }
    round6(acc + prior + 1e-9)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hm = ctx.addReferenceObj("nbWeights", lookup, "java.util.HashMap")
    val fw = s"Double.longBitsToDouble(" +
      s"${java.lang.Double.doubleToLongBits(floorW)}L)"
    val pr = s"Double.longBitsToDouble(" +
      s"${java.lang.Double.doubleToLongBits(prior)}L)"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val w = ctx.freshName("w")
      val raw = ctx.freshName("raw")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  Object $w = $hm.get($a.getUTF8String($i));
         |  $acc += ($w == null) ? $fw : ((java.lang.Double) $w).doubleValue();
         |}
         |if (!${ev.isNull}) {
         |  double $raw = $acc + $pr + 1.0E-9;
         |  if (Double.isNaN($raw) || Double.isInfinite($raw)) {
         |    ${ev.value} = $raw;
         |  } else {
         |    ${ev.value} = java.math.BigDecimal.valueOf($raw)
         |      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue();
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NbFunctions {
  /** Column API for [[NbMargin]]. */
  def graft_nb_margin(tokens: Column, weights: Map[String, Double],
                      floorW: Double, prior: Double): Column =
    ColumnBridge.column(NbMargin(ColumnBridge.expression(tokens),
      weights, floorW, prior))
}
