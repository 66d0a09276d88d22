package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd vector kernels for the embedding column
  * (`Array[Float]`, SURVEY §7.1 `scale/`).
  *
  * The higher-order-function route (`aggregate(zip_with(a, b, _*_), ...)`)
  * is evaluated once per ELEMENT through interpreted lambda closures and
  * blocks whole-stage codegen for the surrounding operators; at 100 TB the
  * dot product is the innermost loop of every ANN/near-dup scan, so it is
  * the one place a hand-written `doGenCode` pays: the generated Java is a
  * tight primitive loop inside the fused stage — no per-element boxing,
  * no closure dispatch, no intermediate array.
  *
  * Numeric contract: elements are widened to double and accumulated
  * left-to-right, bit-identical to both the previous higher-order form and
  * the DuckDB oracle's sequential `sum` over `unnest` — hash-compare-safe.
  * Null semantics: null array -> null result (standard `BinaryExpression`
  * propagation); array ELEMENTS are assumed non-null, matching the
  * embeddings tables' schema (`containsNull` irrelevant for float vectors
  * written by any sane producer — documented engine contract).
  */
private[graft] object VectorExprs {
  def elemGetter(e: Expression): String = e.dataType match {
    case ArrayType(FloatType, _) => "getFloat"
    case _ => "getDouble"
  }

  def checkVec(fn: String, es: Expression*): TypeCheckResult = {
    val ok = es.forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn expects array<float> or array<double> arguments, got " +
        es.map(_.dataType.simpleString).mkString(", "))
  }

  def read(a: ArrayData, getFloat: Boolean, i: Int): Double =
    if (getFloat) a.getFloat(i).toDouble else a.getDouble(i)
}

/** `array_dot(a, b)` = Σᵢ aᵢ·bᵢ over the common prefix length. */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {
  import VectorExprs._

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = checkVec(prettyName, left, right)

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val af = elemGetter(left) == "getFloat"
    val bf = elemGetter(right) == "getFloat"
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += read(a, af, i) * read(b, bf, i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (lGet, rGet) = (elemGetter(left), elemGetter(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayDot =
    copy(left = l, right = r)
  override def prettyName: String = "array_dot"
}

/** `array_norm(a)` = sqrt(Σᵢ aᵢ²). */
case class ArrayNorm(child: Expression) extends UnaryExpression {
  import VectorExprs._

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = checkVec(prettyName, child)

  override protected def nullSafeEval(c: Any): Any = {
    val a = c.asInstanceOf[ArrayData]
    val f = elemGetter(child) == "getFloat"
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { val v = read(a, f, i); acc += v * v; i += 1 }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = elemGetter(child)
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $v = (double) $a.$get($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): ArrayNorm = copy(child = c)
  override def prettyName: String = "array_norm"
}

/** `array_sqdist(a, b)` = Σᵢ (aᵢ−bᵢ)² — the IVF quantizer's assignment
  * metric, fused the same way.
  */
case class ArraySqDist(left: Expression, right: Expression) extends BinaryExpression {
  import VectorExprs._

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = checkVec(prettyName, left, right)

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val af = elemGetter(left) == "getFloat"
    val bf = elemGetter(right) == "getFloat"
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { val d = read(a, af, i) - read(b, bf, i); acc += d * d; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (lGet, rGet) = (elemGetter(left), elemGetter(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $d = ((double) $a.$lGet($i)) - ((double) $b.$rGet($i));
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArraySqDist =
    copy(left = l, right = r)
  override def prettyName: String = "array_sqdist"
}
