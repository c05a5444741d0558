package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the ANN hot loop: dot product over
  * `array<double>`.
  *
  * Preference order per SURVEY.md §7.3: compose built-ins → custom
  * `Expression` → full plan node. The built-in composition
  * (`aggregate(zip_with(...))`) is interpreted per element — measured ~µs
  * per 64-dim pair, which dominates a 2.5M-pair candidate join. This
  * expression generates a tight primitive `for` loop inside whole-stage
  * codegen: no per-element virtual calls, no boxing, no lambda frames.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires array<double> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  // Can produce null beyond child nullability (null array ELEMENT): without
  // this, non-nullable inputs make nullSafeCodeGen emit `ev.isNull = true`
  // against a FalseLiteral — uncompilable Java (codegen fallback) — and the
  // optimizer could wrongly prune IsNotNull filters on the result.
  override def nullable: Boolean = true

  // NULL if either array (or any element) is null — ArrayData.getDouble on
  // a null slot is undefined, it does NOT read as 0
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused cosine similarity: dot, |a|², |b|² in ONE pass over the arrays —
  * for call-sites that cannot pre-normalize (ad-hoc SQL, streaming rows
  * seen once). Null on null/zero inputs (no ANSI divide-by-zero).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    DotProduct(left, right).checkInputDataTypes()
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"
  // Unconditionally nullable: zero-norm vectors yield null even when both
  // children (and all elements) are non-null. Same codegen-safety rationale
  // as [[DotProduct.nullable]].
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val d = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $d = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $xv = $a.getDouble($i); double $yv = $b.getDouble($i);
         |  $d += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |if (!${ev.isNull}) {
         |  if ($na == 0.0 || $nb == 0.0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $d / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)); }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Unit-normalize an `array<double>` in ONE pass: norm computed once per
  * ROW, then each element divided by it. The Column-level spelling
  * (`transform(v, x => try_divide(x, sqrt(graft_dot(v, v))))`) re-evaluates
  * the norm dot product PER ELEMENT — O(d²) per row — and higher-order
  * functions are interpreted (CodegenFallback), which at 100× corpus scale
  * made normalization, not pair scoring, the ANN bottleneck.
  *
  * Null contract is BIT-IDENTICAL to the Column spelling it replaces:
  * null array → null; any null ELEMENT → the norm is null, so every output
  * element is null; zero norm → every output element is null (try_divide's
  * x/0); NaN/Inf norms flow through IEEE division unchanged. Note the
  * all-or-nothing shape: element nulls never occur in isolation, so the
  * fast path can emit a primitive `UnsafeArrayData` and the degenerate
  * path an all-null array.
  */
case class UnitVec(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_unit requires an array<double> input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "graft_unit"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    var anyNull = false
    while (i < n && !anyNull) {
      if (x.isNullAt(i)) anyNull = true else { val v = x.getDouble(i); s += v * v }
      i += 1
    }
    if (anyNull || s == 0.0) new GenericArrayData(new Array[Any](n))
    else {
      val norm = math.sqrt(s)
      val out = new Array[Double](n)
      i = 0
      while (i < n) { out(i) = x.getDouble(i) / norm; i += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val anyNull = ctx.freshName("anyNull")
      val norm = ctx.freshName("norm")
      val out = ctx.freshName("out")
      val ad = classOf[ArrayData].getName
      val gad = classOf[GenericArrayData].getName
      val uad = classOf[UnsafeArrayData].getName
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |boolean $anyNull = false;
         |for (int $i = 0; $i < $n && !$anyNull; $i++) {
         |  if ($a.isNullAt($i)) { $anyNull = true; }
         |  else { double v = $a.getDouble($i); $s += v * v; }
         |}
         |if ($anyNull || $s == 0.0) {
         |  ${ev.value} = ($ad) new $gad(new Object[$n]);
         |} else {
         |  double $norm = java.lang.Math.sqrt($s);
         |  double[] $out = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = $a.getDouble($i) / $norm;
         |  }
         |  ${ev.value} = ($ad) $uad.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  /** Column API for [[DotProduct]]. */
  def graft_dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API for [[CosineSim]]. */
  def graft_cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API for [[UnitVec]]. */
  def graft_unit(v: Column): Column =
    ColumnBridge.column(UnitVec(ColumnBridge.expression(v)))
}
