package graft.functions

import org.apache.spark.ml.linalg.SQLDataTypes
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, UserDefinedType}

/** Euclidean distance from an `ml.linalg.Vector` column to one of a fixed
  * set of centroids selected by an integer column — the codegen'd form of
  * the reference's per-row distance UDF (`anomaly_detection.py:120-128`,
  * SURVEY.md §2.8 U1).
  *
  * The centroid matrix is embedded in the expression (k·dim doubles — a few
  * KB for any realistic KMeans) and shipped to executors once inside the
  * serialized plan, exactly like the closure the Scala udf it replaces
  * captured — but the per-row work now runs inside whole-stage codegen: no
  * ScalaUDF boxing, no `ml.linalg.Vector` object materialization per row.
  * The vector is read directly through its UDT struct encoding
  * (`type:tinyint, size:int, indices:array<int>, values:array<double>`).
  *
  * Bit-equality with `math.sqrt(Vectors.sqdist(v, centers(c)))`: sqdist
  * accumulates `(x_i − c_i)²` in increasing index order for both the
  * dense–dense and sparse–dense cases, so both paths here walk the full
  * index range in order (the sparse path advances a pointer into the
  * indices array) — same additions, same order, same floating-point result.
  *
  * Null when: vector or cluster is null, cluster is out of `[0, k)`, or the
  * vector's dimension differs from the centroids' (where `Vectors.sqdist`
  * would throw — null keeps the expression total, and the ML pipeline never
  * produces it since the assembler fixes the dimension).
  */
case class CentroidDist(vector: Expression, cluster: Expression,
                        centers: IndexedSeq[IndexedSeq[Double]])
    extends BinaryExpression {

  // Seq params (not Array): case-class equals/hashCode on arrays is
  // reference identity, which would defeat expression canonicalization —
  // semanticEquals, subexpression elimination, ReuseExchange, and
  // cache-manager sameResult matching (CacheScope's ownedByOuter check)
  // all need separately-constructed-but-identical expressions to compare
  // equal. The hot loops and codegen use this primitive mirror.
  @transient private lazy val centerArr: Array[Array[Double]] =
    centers.map(_.toArray).toArray

  override def left: Expression = vector
  override def right: Expression = cluster

  override def checkInputDataTypes(): TypeCheckResult = {
    val vOk = vector.dataType match {
      case udt: UserDefinedType[_] => udt == SQLDataTypes.VectorType
      case _ => false
    }
    if (!vOk)
      TypeCheckResult.TypeCheckFailure(
        s"graft_centroid_dist requires a vector column, got " +
          vector.dataType.simpleString)
    else if (cluster.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_centroid_dist requires an int cluster column, got " +
          cluster.dataType.simpleString)
    else if (centers.isEmpty || centers.exists(_.length != centers(0).length))
      TypeCheckResult.TypeCheckFailure(
        "graft_centroid_dist requires a non-empty rectangular centroid matrix")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_centroid_dist"
  // Null beyond child nullability (out-of-range cluster, dim mismatch) —
  // same codegen-safety rationale as DotProduct.nullable.
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any, c: Any): Any = {
    val row = v.asInstanceOf[InternalRow]
    val k = c.asInstanceOf[Int]
    if (k < 0 || k >= centerArr.length) return null
    val ctr = centerArr(k)
    val dim = ctr.length
    val vals = row.getArray(3)
    var s = 0.0
    if (row.getByte(0) == 1) { // dense
      if (vals.numElements() != dim) return null
      var i = 0
      while (i < dim) {
        val d = vals.getDouble(i) - ctr(i)
        s += d * d
        i += 1
      }
    } else { // sparse: full index walk, pointer into indices — sqdist order
      if (row.getInt(1) != dim) return null
      val idx = row.getArray(2)
      val nnz = idx.numElements()
      var p = 0
      var i = 0
      while (i < dim) {
        val x = if (p < nnz && idx.getInt(p) == i) {
          val xv = vals.getDouble(p); p += 1; xv
        } else 0.0
        val d = x - ctr(i)
        s += d * d
        i += 1
      }
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ctrsRef = ctx.addReferenceObj("centers", centerArr, "double[][]")
    nullSafeCodeGen(ctx, ev, (v, c) => {
      val ctr = ctx.freshName("ctr")
      val dim = ctx.freshName("dim")
      val vals = ctx.freshName("vals")
      val idx = ctx.freshName("idx")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val nnz = ctx.freshName("nnz")
      val x = ctx.freshName("x")
      val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
      s"""
         |if ($c < 0 || $c >= $ctrsRef.length) { ${ev.isNull} = true; }
         |else {
         |  double[] $ctr = $ctrsRef[$c];
         |  int $dim = $ctr.length;
         |  $ad $vals = $v.getArray(3);
         |  double $s = 0.0;
         |  if ($v.getByte(0) == (byte) 1) {
         |    if ($vals.numElements() != $dim) { ${ev.isNull} = true; }
         |    else {
         |      for (int $i = 0; $i < $dim; $i++) {
         |        double $d = $vals.getDouble($i) - $ctr[$i];
         |        $s += $d * $d;
         |      }
         |    }
         |  } else {
         |    if ($v.getInt(1) != $dim) { ${ev.isNull} = true; }
         |    else {
         |      $ad $idx = $v.getArray(2);
         |      int $nnz = $idx.numElements();
         |      int $p = 0;
         |      for (int $i = 0; $i < $dim; $i++) {
         |        double $x = 0.0;
         |        if ($p < $nnz && $idx.getInt($p) == $i) { $x = $vals.getDouble($p); $p++; }
         |        double $d = $x - $ctr[$i];
         |        $s += $d * $d;
         |      }
         |    }
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = java.lang.Math.sqrt($s); }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vector = newLeft, cluster = newRight)
}

object CentroidFunctions {
  /** Column API for [[CentroidDist]]. */
  def graft_centroid_dist(vector: Column, cluster: Column,
                          centers: Array[Array[Double]]): Column =
    ColumnBridge.column(CentroidDist(
      ColumnBridge.expression(vector), ColumnBridge.expression(cluster),
      centers.map(_.toIndexedSeq).toIndexedSeq))
}

/** Fused SQ8 decode + cosine: both inputs are `array<int>` quantization
  * codes; each element decodes through the embedded affine codebook
  * (`x̂_i = q_i · span_i / 255 + mn_i` — the exact arithmetic the
  * [[graft.ext.Similarity.sq8TopK]] oracle mirrors) and dot/norms
  * accumulate in ONE index-order loop inside whole-stage codegen.
  *
  * Replaces the interpreted nested `zip_with` reconstruction that
  * dominated the sq8 candidate scoring (higher-order functions evaluate
  * per element with boxed lambdas — ~512 boxed evals per candidate pair;
  * this loop is primitive arithmetic). Null on: null inputs, null
  * elements, code arrays shorter than the codebook, or a zero-norm
  * reconstruction (the never-ranks contract, no ANSI divide-by-zero).
  */
case class Sq8Cosine(left: Expression, right: Expression,
                     mn: IndexedSeq[Double], span: IndexedSeq[Double])
    extends BinaryExpression {

  // Seq params for content-based equals/hashCode — same canonicalization
  // rationale as CentroidDist; primitive mirrors for eval/codegen.
  @transient private lazy val mnArr: Array[Double] = mn.toArray
  @transient private lazy val spanArr: Array[Double] = span.toArray

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.IntegerType, _) => true
      case _ => false
    })
    if (!ok)
      TypeCheckResult.TypeCheckFailure(
        s"graft_sq8_cosine requires array<int> code inputs, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else if (mn.length != span.length || mn.isEmpty)
      TypeCheckResult.TypeCheckFailure(
        "graft_sq8_cosine requires matching non-empty mn/span codebooks")
    else TypeCheckResult.TypeCheckSuccess
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sq8_cosine"
  // Null beyond child nullability (zero-norm decode, dim mismatch) — same
  // codegen-safety rationale as DotProduct.nullable.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = mnArr.length
    if (x.numElements() < n || y.numElements() < n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xa = x.getInt(i) * spanArr(i) / 255.0 + mnArr(i)
      val xb = y.getInt(i) * spanArr(i) / 255.0 + mnArr(i)
      dot += xa * xb; na += xa * xa; nb += xb * xb
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mnRef = ctx.addReferenceObj("mn", mnArr, "double[]")
    val spanRef = ctx.addReferenceObj("span", spanArr, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val d = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xa = ctx.freshName("xa"); val xb = ctx.freshName("xb")
      s"""
         |int $n = $mnRef.length;
         |if ($a.numElements() < $n || $b.numElements() < $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $d = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xa = $a.getInt($i) * $spanRef[$i] / 255.0 + $mnRef[$i];
         |    double $xb = $b.getInt($i) * $spanRef[$i] / 255.0 + $mnRef[$i];
         |    $d += $xa * $xb; $na += $xa * $xa; $nb += $xb * $xb;
         |  }
         |  if (!${ev.isNull}) {
         |    if ($na == 0.0 || $nb == 0.0) { ${ev.isNull} = true; }
         |    else { ${ev.value} = $d / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)); }
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused SQ8 encode: `array<double>` vector → `array<int>` quantization
  * codes through the embedded affine codebook, one primitive loop in
  * whole-stage codegen — replacing the interpreted nested `zip_with`
  * (`codesOf`) that was the last higher-order function on a corpus-wide
  * pass in the ANN family (boxed lambda per element per row; encode runs
  * over EVERY corpus vector, so at 100 TB it is a scan-dominating cost).
  *
  * Bit-parity contract with the stack it replaces:
  * `zip_with(zip_with(v, mn, x − m), span, when(s > 0,
  * round((d·255)/s)).otherwise(0).cast("int"))` —
  *  - output length is `max(|v|, dim)` (zip_with null-pads the shorter
  *    side);
  *  - the `when` keys on SPAN: a null-padded span (`i ≥ dim`) and a
  *    zero/negative span both take the `otherwise` branch → element 0,
  *    REGARDLESS of the vector element (even a null one); only a
  *    positive span with a missing/null vector element (`i ≥ |v|` or
  *    `v[i]` null) yields a null element (null rode through the round);
  *  - arithmetic is `((v_i − mn_i) · 255.0) / span_i` in exactly that
  *    association, rounded with Spark `round(_, 0)` semantics
  *    (BigDecimal HALF_UP; NaN/Infinity pass through) then cast to int.
  *
  * ONE deliberate divergence (pinned by spec): a NaN span. Spark's NaN
  * ordering makes `NaN > 0` TRUE, so the stack sent `x·255/NaN = NaN`
  * into the int cast — an ANSI CAST_OVERFLOW that killed the whole query
  * the first time a corpus carried a NaN value (min/max propagate NaN to
  * the span). Here a NaN span codes to 0, the same "degenerate dimension
  * contributes nothing" contract as zero span — totality over parity,
  * matching Sq8Cosine's zero-norm-null rationale.
  */
case class Sq8Encode(child: Expression,
                     mn: IndexedSeq[Double], span: IndexedSeq[Double])
    extends UnaryExpression {

  // Seq params for content-based equals/hashCode — same canonicalization
  // rationale as CentroidDist; primitive mirrors for eval/codegen.
  @transient private lazy val mnArr: Array[Double] = mn.toArray
  @transient private lazy val spanArr: Array[Double] = span.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(DoubleType, _) =>
      if (mn.length != span.length || mn.isEmpty)
        TypeCheckResult.TypeCheckFailure(
          "graft_sq8_encode requires matching non-empty mn/span codebooks")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_sq8_encode requires an array<double> input, got " +
        other.simpleString)
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(IntegerType, containsNull = true)
  override def prettyName: String = "graft_sq8_encode"

  /** Shared by eval and the codegen template via static call: Spark
    * `round(_, 0)` then non-ANSI double→int cast, as one step. The int-range
    * clamps cover Infinity AND large-finite values — `BigDecimal.intValue()`
    * would wrap (low 32 bits) past int range, diverging from the saturating
    * non-ANSI cast; unreachable for in-corpus vectors (raw ≤ 255 by
    * construction) but safe when encode is applied outside the codebook's
    * min/max corpus.
    */
  @inline private def roundToInt(raw: Double): Int =
    if (java.lang.Double.isNaN(raw)) 0
    else if (raw >= Int.MaxValue.toDouble) Int.MaxValue
    else if (raw <= Int.MinValue.toDouble) Int.MinValue
    else java.math.BigDecimal.valueOf(raw)
      .setScale(0, java.math.RoundingMode.HALF_UP).intValue()

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = x.numElements()
    val dim = mnArr.length
    val out = new Array[Any](math.max(n, dim))
    var i = 0
    while (i < out.length) {
      out(i) =
        if (i >= dim || !(spanArr(i) > 0)) 0 // otherwise-branch (incl. NaN
        // span: `when(s > 0)` is false for NaN, same as this negation)
        else if (i >= n || x.isNullAt(i)) null
        else roundToInt((x.getDouble(i) - mnArr(i)) * 255.0 / spanArr(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mnRef = ctx.addReferenceObj("mn", mnArr, "double[]")
    val spanRef = ctx.addReferenceObj("span", spanArr, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val dim = ctx.freshName("dim")
      val len = ctx.freshName("len"); val i = ctx.freshName("i")
      val out = ctx.freshName("out"); val code = ctx.freshName("code")
      val raw = ctx.freshName("raw")
      // Object[] + GenericArrayData: the output mixes ints and nulls, and
      // one box per element is still orders cheaper than the per-element
      // interpreted lambda this replaces
      s"""
         |int $n = $a.numElements();
         |int $dim = $mnRef.length;
         |int $len = java.lang.Math.max($n, $dim);
         |Object[] $out = new Object[$len];
         |for (int $i = 0; $i < $len; $i++) {
         |  if ($i >= $dim || !($spanRef[$i] > 0)) {
         |    $out[$i] = 0; // otherwise-branch: span keys it (incl. NaN span)
         |  } else if ($i >= $n || $a.isNullAt($i)) {
         |    // stays null: positive span, missing/null vector element
         |  } else {
         |    double $raw = ($a.getDouble($i) - $mnRef[$i]) * 255.0 / $spanRef[$i];
         |    int $code;
         |    if (Double.isNaN($raw)) { $code = 0; }
         |    else if ($raw >= (double) Integer.MAX_VALUE) {
         |      $code = Integer.MAX_VALUE;  // saturate: Infinity + large-finite
         |    } else if ($raw <= (double) Integer.MIN_VALUE) {
         |      $code = Integer.MIN_VALUE;
         |    } else {
         |      $code = java.math.BigDecimal.valueOf($raw)
         |        .setScale(0, java.math.RoundingMode.HALF_UP).intValue();
         |    }
         |    $out[$i] = $code;
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Sq8Functions {
  /** Column API for [[Sq8Cosine]]. */
  def graft_sq8_cosine(codesA: Column, codesB: Column,
                       mn: Array[Double], span: Array[Double]): Column =
    ColumnBridge.column(Sq8Cosine(
      ColumnBridge.expression(codesA), ColumnBridge.expression(codesB),
      mn.toIndexedSeq, span.toIndexedSeq))

  /** Column API for [[Sq8Encode]]. */
  def graft_sq8_encode(vec: Column, mn: Array[Double],
                       span: Array[Double]): Column =
    ColumnBridge.column(Sq8Encode(ColumnBridge.expression(vec),
      mn.toIndexedSeq, span.toIndexedSeq))
}

/** Nearest-centroid assignment over an embedded centers matrix: the argmin
  * of the guard-rounded squared-L2 distance to each center, ties to the
  * lowest center index — ONE expression looping over centers in generated
  * code, replacing [[graft.ext.Similarity.kmeansBuckets]]'s k-wide column
  * stack (`array(round(dot − 2·dot + cc + 1e-9, 6), …k…)` → `array_min` →
  * `array_position`). That stack broke the quantizer's documented
  * production lever ("grow k with the corpus") twice: the plan carried
  * k·dim doubles as k separate `typedLit` literals, and whole-stage
  * codegen blew the 64KB method limit around a few hundred array entries,
  * silently falling back to interpreted eval on the hottest expression.
  * Here the matrix ships once as a reference object and the generated code
  * is two fixed-size loops — constant bytecode at any k.
  *
  * Bit-parity contract with the stack it replaces (and the DuckDB oracle):
  *  - per center j: `d_j = round6(Σv_i² − 2·Σ(v_i·c_j_i) + cc_j + 1e-9)`
  *    with every Σ accumulated in increasing index order; `cc_j` is the
  *    driver-side index-order fold (= the oracle's
  *    `list_inner_product(c, c)`);
  *  - `round6` is exactly Spark's `round(_, 6)` on double: NaN/Infinity
  *    pass through, else `BigDecimal.valueOf(x).setScale(6, HALF_UP)`;
  *  - argmin uses Spark's double ordering (`-0.0 == 0.0` equal, NaN
  *    greatest), first-minimum wins — the `array_position` tiebreak;
  *  - cross terms sum over `min(|v|, dim_j)` elements, mirroring
  *    [[graft.functions.DotProduct]]'s min-length fold;
  *  - null iff the vector is null or any element is null (a null element
  *    nulled every distance in the stack, so `array_min` → `array_position`
  *    yielded null).
  */
case class ArgMinCentroid(child: Expression,
                          centers: IndexedSeq[IndexedSeq[Double]])
    extends UnaryExpression {

  // Seq param for content-based equals/hashCode — same canonicalization
  // rationale as CentroidDist; primitive mirrors for eval/codegen.
  @transient private lazy val centerArr: Array[Array[Double]] =
    centers.map(_.toArray).toArray
  // Σc² per center, index order — matches the oracle's
  // list_inner_product(c, c) summation order exactly.
  @transient private lazy val ccArr: Array[Double] =
    centers.map(_.foldLeft(0.0)((a, x) => a + x * x)).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(DoubleType, _) =>
      if (centers.isEmpty)
        TypeCheckResult.TypeCheckFailure(
          "graft_argmin_centroid requires a non-empty centers matrix")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_argmin_centroid requires an array<double> input, got " +
        other.simpleString)
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_argmin_centroid"
  // Null beyond child nullability (null array element) — same
  // codegen-safety rationale as DotProduct.nullable.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = x.numElements()
    var vv = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getDouble(i); vv += v * v
      i += 1
    }
    var best = -1
    var bestD = 0.0
    var j = 0
    while (j < centerArr.length) {
      val c = centerArr(j)
      val m = math.min(n, c.length)
      var cross = 0.0
      var t = 0
      while (t < m) { cross += x.getDouble(t) * c(t); t += 1 }
      val raw = vv - 2.0 * cross + ccArr(j) + 1e-9
      val d =
        if (java.lang.Double.isNaN(raw) || java.lang.Double.isInfinite(raw)) raw
        else java.math.BigDecimal.valueOf(raw)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      // Spark double ordering: == first (-0.0 equals 0.0), NaN greatest via
      // Double.compare; strict < keeps the FIRST minimum (array_position)
      if (best < 0 ||
          (d != bestD && java.lang.Double.compare(d, bestD) < 0)) {
        bestD = d; best = j
      }
      j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ctrsRef = ctx.addReferenceObj("centers", centerArr, "double[][]")
    val ccRef = ctx.addReferenceObj("cc", ccArr, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val vv = ctx.freshName("vv")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val t = ctx.freshName("t"); val m = ctx.freshName("m")
      val c = ctx.freshName("c"); val cross = ctx.freshName("cross")
      val raw = ctx.freshName("raw"); val d = ctx.freshName("d")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      s"""
         |int $n = $a.numElements();
         |double $vv = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double v = $a.getDouble($i); $vv += v * v;
         |}
         |if (!${ev.isNull}) {
         |  int $best = -1; double $bestD = 0.0;
         |  for (int $j = 0; $j < $ctrsRef.length; $j++) {
         |    double[] $c = $ctrsRef[$j];
         |    int $m = java.lang.Math.min($n, $c.length);
         |    double $cross = 0.0;
         |    for (int $t = 0; $t < $m; $t++) {
         |      $cross += $a.getDouble($t) * $c[$t];
         |    }
         |    double $raw = $vv - 2.0 * $cross + $ccRef[$j] + 1.0E-9;
         |    double $d;
         |    if (Double.isNaN($raw) || Double.isInfinite($raw)) { $d = $raw; }
         |    else {
         |      $d = java.math.BigDecimal.valueOf($raw)
         |        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue();
         |    }
         |    if ($best < 0 ||
         |        ($d != $bestD && java.lang.Double.compare($d, $bestD) < 0)) {
         |      $bestD = $d; $best = $j;
         |    }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Random-hyperplane LSH signature: bit `p` of the result is the sign of
  * the projection of the input vector onto fixed hyperplane `p` — the
  * codegen'd replacement for [[graft.ext.Similarity.hyperplaneBucket]]'s
  * interpreted `aggregate(zip_with(transform(sequence(...))))` HOF stack,
  * which evaluated per row with boxed lambdas AND re-generated the plane
  * components per element (r7/r8 verdict item: codegen it or delete it).
  * The planes matrix is built once on the driver and ships as a reference
  * object; the generated code is two fixed-size primitive loops — same
  * shape as [[ArgMinCentroid]].
  *
  * Determinism/oracle contract: each projection is accumulated in index
  * order over `min(|v|, dim_p)` elements and guard-rounded to 6dp
  * (`round(proj + 1e-9, 6)`, Spark `round` semantics) BEFORE the sign
  * test, so an engine recomputing the same integer-hash planes (see
  * `hyperplaneBucket`) reproduces every bit exactly — transcendental-free
  * planes + the guard absorb any FP summation drift. Null iff the vector
  * is null or any element is null.
  */
case class SignBits(child: Expression,
                    planes: IndexedSeq[IndexedSeq[Double]])
    extends UnaryExpression {

  // Seq param for content-based equals/hashCode — same canonicalization
  // rationale as CentroidDist; primitive mirror for eval/codegen.
  @transient private lazy val planeArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(DoubleType, _) =>
      if (planes.isEmpty || planes.length > 63)
        TypeCheckResult.TypeCheckFailure(
          s"graft_sign_bits requires 1..63 planes, got ${planes.length}")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_sign_bits requires an array<double> input, got " +
        other.simpleString)
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_sign_bits"
  // Null beyond child nullability (null array element) — same
  // codegen-safety rationale as DotProduct.nullable.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = x.numElements()
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      i += 1
    }
    var sig = 0L
    var p = 0
    while (p < planeArr.length) {
      val w = planeArr(p)
      val m = math.min(n, w.length)
      var s = 0.0
      var j = 0
      while (j < m) { s += x.getDouble(j) * w(j); j += 1 }
      val raw = s + 1e-9
      val pr =
        if (java.lang.Double.isNaN(raw) || java.lang.Double.isInfinite(raw)) raw
        else java.math.BigDecimal.valueOf(raw)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      if (pr > 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val plRef = ctx.addReferenceObj("planes", planeArr, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val p = ctx.freshName("p"); val j = ctx.freshName("j")
      val m = ctx.freshName("m"); val w = ctx.freshName("w")
      val s = ctx.freshName("s"); val raw = ctx.freshName("raw")
      val pr = ctx.freshName("pr"); val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |}
         |if (!${ev.isNull}) {
         |  long $sig = 0L;
         |  for (int $p = 0; $p < $plRef.length; $p++) {
         |    double[] $w = $plRef[$p];
         |    int $m = java.lang.Math.min($n, $w.length);
         |    double $s = 0.0;
         |    for (int $j = 0; $j < $m; $j++) {
         |      $s += $a.getDouble($j) * $w[$j];
         |    }
         |    double $raw = $s + 1.0E-9;
         |    double $pr;
         |    if (Double.isNaN($raw) || Double.isInfinite($raw)) { $pr = $raw; }
         |    else {
         |      $pr = java.math.BigDecimal.valueOf($raw)
         |        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue();
         |    }
         |    if ($pr > 0) { $sig |= 1L << $p; }
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignBitsFunctions {
  /** Column API for [[SignBits]]. */
  def graft_sign_bits(vec: Column,
                      planes: Array[Array[Double]]): Column =
    ColumnBridge.column(SignBits(ColumnBridge.expression(vec),
      planes.map(_.toIndexedSeq).toIndexedSeq))
}

object ArgMinFunctions {
  /** Column API for [[ArgMinCentroid]]. */
  def graft_argmin_centroid(vec: Column,
                            centers: Array[Array[Double]]): Column =
    ColumnBridge.column(ArgMinCentroid(ColumnBridge.expression(vec),
      centers.map(_.toIndexedSeq).toIndexedSeq))
}

/** Symmetric product-quantization (SDC) cosine: both inputs are `array<int>`
  * PQ codes — one sub-codebook index per subspace — and the approximate
  * cosine between the two RECONSTRUCTED vectors is computed without ever
  * touching a vector: the inner products between every pair of sub-centroids
  * were precomputed per subspace into `tables` (m flat kSub×kSub grids,
  * `tables(j)(a·kSub + b) = ⟨c_ja, c_jb⟩`, built by
  * [[graft.ext.Similarity.pqTopK]] on the driver), so the per-pair work is
  * 3·m array lookups — dot, and both self-norms off the table diagonals —
  * inside whole-stage codegen. This is the FAISS-style scoring shape: at
  * 100 TB the candidate shuffle moves m small ints per vector and the
  * scoring loop never decodes.
  *
  * Subspace partials are accumulated in subspace order (left fold), and the
  * driver builds each table entry by a dimension-order fold, so the DuckDB
  * oracle's `lip(sub_0) + lip(sub_1) + …` over the same reconstructed
  * sub-centroids reproduces the float bit-for-bit modulo the house 6dp
  * guard-round. Null on: null inputs, null elements, code arrays shorter
  * than m, any code outside `[0, kSub)`, or a zero reconstructed norm
  * (the never-ranks contract shared with [[Sq8Cosine]]).
  */
case class PqSdcCosine(left: Expression, right: Expression,
                       tables: IndexedSeq[IndexedSeq[Double]], kSub: Int)
    extends BinaryExpression {

  // Seq params for content-based equals/hashCode — same canonicalization
  // rationale as CentroidDist; primitive mirror for eval/codegen.
  @transient private lazy val tblArr: Array[Array[Double]] =
    tables.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.IntegerType, _) => true
      case _ => false
    })
    if (!ok)
      TypeCheckResult.TypeCheckFailure(
        s"graft_pq_cosine requires array<int> code inputs, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else if (tables.isEmpty || kSub <= 0 ||
        tables.exists(_.length != kSub * kSub))
      TypeCheckResult.TypeCheckFailure(
        "graft_pq_cosine requires m non-empty kSub×kSub lookup tables")
    else TypeCheckResult.TypeCheckSuccess
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_cosine"
  // Null beyond child nullability (out-of-range code, zero norm) — same
  // codegen-safety rationale as Sq8Cosine.nullable.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val m = tblArr.length
    if (x.numElements() < m || y.numElements() < m) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var j = 0
    while (j < m) {
      if (x.isNullAt(j) || y.isNullAt(j)) return null
      val ca = x.getInt(j); val cb = y.getInt(j)
      if (ca < 0 || ca >= kSub || cb < 0 || cb >= kSub) return null
      val t = tblArr(j)
      dot += t(ca * kSub + cb)
      na += t(ca * kSub + ca)
      nb += t(cb * kSub + cb)
      j += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tblRef = ctx.addReferenceObj("tables", tblArr, "double[][]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val j = ctx.freshName("j"); val mN = ctx.freshName("m")
      val d = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val ca = ctx.freshName("ca"); val cb = ctx.freshName("cb")
      val t = ctx.freshName("t")
      s"""
         |int $mN = $tblRef.length;
         |if ($a.numElements() < $mN || $b.numElements() < $mN) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $d = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $j = 0; $j < $mN; $j++) {
         |    if ($a.isNullAt($j) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    int $ca = $a.getInt($j); int $cb = $b.getInt($j);
         |    if ($ca < 0 || $ca >= $kSub || $cb < 0 || $cb >= $kSub) {
         |      ${ev.isNull} = true; break;
         |    }
         |    double[] $t = $tblRef[$j];
         |    $d += $t[$ca * $kSub + $cb];
         |    $na += $t[$ca * $kSub + $ca];
         |    $nb += $t[$cb * $kSub + $cb];
         |  }
         |  if (!${ev.isNull}) {
         |    if ($na == 0.0 || $nb == 0.0) { ${ev.isNull} = true; }
         |    else { ${ev.value} = $d / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)); }
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqFunctions {
  /** Column API for [[PqSdcCosine]]. */
  def graft_pq_cosine(codesA: Column, codesB: Column,
                      tables: Array[Array[Double]], kSub: Int): Column =
    ColumnBridge.column(PqSdcCosine(
      ColumnBridge.expression(codesA), ColumnBridge.expression(codesB),
      tables.map(_.toIndexedSeq).toIndexedSeq, kSub))

  /** Column API for [[PqAdcCosine]]. */
  def graft_pq_adc_cosine(qvec: Column, codes: Column,
                          books: Array[Array[Double]], kSub: Int): Column =
    ColumnBridge.column(PqAdcCosine(
      ColumnBridge.expression(qvec), ColumnBridge.expression(codes),
      books.map(_.toIndexedSeq).toIndexedSeq, kSub))

  /** Column API for [[PqResAdcCosine]]. */
  def graft_pq_res_adc_cosine(qvec: Column, cvec: Column, codes: Column,
                              books: Array[Array[Double]],
                              kSub: Int): Column =
    ColumnBridge.column(PqResAdcCosine(
      ColumnBridge.expression(qvec), ColumnBridge.expression(cvec),
      ColumnBridge.expression(codes),
      books.map(_.toIndexedSeq).toIndexedSeq, kSub))
}

/** Asymmetric product-quantization (ADC) cosine: the query side is a RAW
  * `array<double>` vector, the candidate side is `array<int>` PQ codes, and
  * the approximate cosine is computed against the candidate's reconstructed
  * sub-centroids with the embedded codebooks (`books(j)` = subspace j's
  * kSub×dsub centers, flattened row-major) — FAISS's default scoring mode:
  * the CORPUS side (the big side, capped per cell) stays 2-byte codes while
  * each query pays its own floats once, and per-pair error drops to one
  * quantization instead of [[PqSdcCosine]]'s two.
  *
  * Float-association contract with the DuckDB mirror: the query norm is ONE
  * sequential fold over all dims (`list_inner_product(v, v)`); the dot and
  * candidate norm accumulate per-subspace partials in dimension order and
  * sum them in subspace order (`lip(v[lo:hi], rc_j) + …` left fold). Null
  * on: null inputs, null elements, short arrays, any code outside
  * `[0, kSub)`, or a zero norm on either side (the never-ranks contract).
  */
case class PqAdcCosine(left: Expression, right: Expression,
                       books: IndexedSeq[IndexedSeq[Double]],
                       kSub: Int)
    extends BinaryExpression {

  // Seq params for content-based equals/hashCode — same canonicalization
  // rationale as CentroidDist; primitive mirror for eval/codegen.
  @transient private lazy val bookArr: Array[Array[Double]] =
    books.map(_.toArray).toArray

  private def dsub: Int = books(0).length / kSub

  override def checkInputDataTypes(): TypeCheckResult = {
    import org.apache.spark.sql.types.ArrayType
    val lOk = left.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val rOk = right.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (!lOk || !rOk)
      TypeCheckResult.TypeCheckFailure(
        s"graft_pq_adc_cosine requires (array<double>, array<int>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else if (books.isEmpty || kSub <= 0 ||
        books.exists(b => b.isEmpty || b.length % kSub != 0) ||
        books.exists(_.length != books(0).length))
      TypeCheckResult.TypeCheckFailure(
        "graft_pq_adc_cosine requires m same-shape kSub×dsub codebooks")
    else TypeCheckResult.TypeCheckSuccess
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc_cosine"
  // Null beyond child nullability (out-of-range code, zero norm) — same
  // codegen-safety rationale as Sq8Cosine.nullable.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val m = bookArr.length
    val ds = dsub
    if (x.numElements() < m * ds || y.numElements() < m) return null
    var qn = 0.0
    var i = 0
    while (i < m * ds) {
      if (x.isNullAt(i)) return null
      val v = x.getDouble(i); qn += v * v
      i += 1
    }
    var num = 0.0; var cn = 0.0
    var j = 0
    while (j < m) {
      if (y.isNullAt(j)) return null
      val ca = y.getInt(j)
      if (ca < 0 || ca >= kSub) return null
      val book = bookArr(j)
      val base = ca * ds
      var s = 0.0; var t = 0.0
      var d = 0
      while (d < ds) {
        val cd = book(base + d)
        s += x.getDouble(j * ds + d) * cd
        t += cd * cd
        d += 1
      }
      num += s; cn += t
      j += 1
    }
    if (qn == 0.0 || cn == 0.0) null
    else num / (math.sqrt(qn) * math.sqrt(cn))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("books", bookArr, "double[][]")
    val kSubV = kSub
    val dsV = dsub
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val d = ctx.freshName("d"); val mN = ctx.freshName("m")
      val qn = ctx.freshName("qn"); val num = ctx.freshName("num")
      val cn = ctx.freshName("cn"); val v = ctx.freshName("v")
      val ca = ctx.freshName("ca"); val book = ctx.freshName("book")
      val base = ctx.freshName("base"); val s = ctx.freshName("s")
      val t = ctx.freshName("t"); val cd = ctx.freshName("cd")
      s"""
         |int $mN = $booksRef.length;
         |if ($a.numElements() < $mN * $dsV || $b.numElements() < $mN) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $qn = 0.0;
         |  for (int $i = 0; $i < $mN * $dsV; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $v = $a.getDouble($i); $qn += $v * $v;
         |  }
         |  double $num = 0.0; double $cn = 0.0;
         |  if (!${ev.isNull}) {
         |    for (int $j = 0; $j < $mN; $j++) {
         |      if ($b.isNullAt($j)) { ${ev.isNull} = true; break; }
         |      int $ca = $b.getInt($j);
         |      if ($ca < 0 || $ca >= $kSubV) { ${ev.isNull} = true; break; }
         |      double[] $book = $booksRef[$j];
         |      int $base = $ca * $dsV;
         |      double $s = 0.0; double $t = 0.0;
         |      for (int $d = 0; $d < $dsV; $d++) {
         |        double $cd = $book[$base + $d];
         |        $s += $a.getDouble($j * $dsV + $d) * $cd;
         |        $t += $cd * $cd;
         |      }
         |      $num += $s; $cn += $t;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    if ($qn == 0.0 || $cn == 0.0) { ${ev.isNull} = true; }
         |    else { ${ev.value} = $num / (java.lang.Math.sqrt($qn) * java.lang.Math.sqrt($cn)); }
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Residual-ADC cosine — the scorer of FAISS's true IVFPQ coding: the
  * candidate is stored as PQ codes of its RESIDUAL `r = x − c(cell)`, so
  * its reconstruction is `x̂ = cvec + book_j(code_j)` and the approximate
  * cosine is `q · x̂ / (|q|·|x̂|)` with the probed cell's mean centroid
  * `cvec` supplied per pair (it rides the probe side of the candidate
  * join — queries × nProbe rows — while the corpus side stays m codes).
  * Residual codebooks are far better conditioned than raw-vector
  * codebooks at the same bit budget: the coarse quantizer has already
  * removed the cell mean, so the sub-quantizers spend their kSub cells on
  * the remaining spread.
  *
  * Float-association contract with the DuckDB mirror (which computes
  * `full = list_transform(range, i -> cvec[i] + rcat[i])` then
  * `list_inner_product(q, full)` etc.): reconstruction, dot, and both
  * norms each accumulate in strict dimension order as single sequential
  * folds. Null on: null/short inputs, null elements, out-of-range codes,
  * or a zero norm on either side (the never-ranks contract, as
  * [[PqAdcCosine]]).
  */
case class PqResAdcCosine(first: Expression, second: Expression,
                          third: Expression,
                          books: IndexedSeq[IndexedSeq[Double]],
                          kSub: Int)
    extends TernaryExpression {

  @transient private lazy val bookArr: Array[Array[Double]] =
    books.map(_.toArray).toArray

  private def dsub: Int = books(0).length / kSub

  override def checkInputDataTypes(): TypeCheckResult = {
    import org.apache.spark.sql.types.ArrayType
    val qOk = first.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val cOk = second.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val kOk = third.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (!qOk || !cOk || !kOk)
      TypeCheckResult.TypeCheckFailure(
        s"graft_pq_res_adc_cosine requires (array<double>, array<double>, " +
          s"array<int>), got (${first.dataType.simpleString}, " +
          s"${second.dataType.simpleString}, ${third.dataType.simpleString})")
    else if (books.isEmpty || kSub <= 0 ||
        books.exists(b => b.isEmpty || b.length % kSub != 0) ||
        books.exists(_.length != books(0).length))
      TypeCheckResult.TypeCheckFailure(
        "graft_pq_res_adc_cosine requires m same-shape kSub×dsub codebooks")
    else TypeCheckResult.TypeCheckSuccess
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_res_adc_cosine"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val q = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val cv = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val code = c.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val m = bookArr.length
    val ds = dsub
    val dim = m * ds
    if (q.numElements() < dim || cv.numElements() < dim ||
      code.numElements() < m) return null
    var qn = 0.0
    var i = 0
    while (i < dim) {
      if (q.isNullAt(i)) return null
      val v = q.getDouble(i); qn += v * v
      i += 1
    }
    var num = 0.0; var cn = 0.0
    i = 0
    while (i < dim) {
      val j = i / ds
      if (cv.isNullAt(i) || code.isNullAt(j)) return null
      val ca = code.getInt(j)
      if (ca < 0 || ca >= kSub) return null
      val f = cv.getDouble(i) + bookArr(j)(ca * ds + i % ds)
      num += q.getDouble(i) * f
      cn += f * f
      i += 1
    }
    if (qn == 0.0 || cn == 0.0) null
    else num / (math.sqrt(qn) * math.sqrt(cn))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("books", bookArr, "double[][]")
    val kSubV = kSub
    val dsV = dsub
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val mN = ctx.freshName("m"); val dim = ctx.freshName("dim")
      val qn = ctx.freshName("qn"); val num = ctx.freshName("num")
      val cn = ctx.freshName("cn"); val v = ctx.freshName("v")
      val ca = ctx.freshName("ca"); val f = ctx.freshName("f")
      s"""
         |int $mN = $booksRef.length;
         |int $dim = $mN * $dsV;
         |if ($a.numElements() < $dim || $b.numElements() < $dim ||
         |    $c.numElements() < $mN) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $qn = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $v = $a.getDouble($i); $qn += $v * $v;
         |  }
         |  double $num = 0.0; double $cn = 0.0;
         |  if (!${ev.isNull}) {
         |    for (int $i = 0; $i < $dim; $i++) {
         |      int $j = $i / $dsV;
         |      if ($b.isNullAt($i) || $c.isNullAt($j)) {
         |        ${ev.isNull} = true; break;
         |      }
         |      int $ca = $c.getInt($j);
         |      if ($ca < 0 || $ca >= $kSubV) { ${ev.isNull} = true; break; }
         |      double $f = $b.getDouble($i) + $booksRef[$j][$ca * $dsV + $i % $dsV];
         |      $num += $a.getDouble($i) * $f;
         |      $cn += $f * $f;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    if ($qn == 0.0 || $cn == 0.0) { ${ev.isNull} = true; }
         |    else { ${ev.value} = $num / (java.lang.Math.sqrt($qn) * java.lang.Math.sqrt($cn)); }
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
