package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dense dot product over array<float> / array<double>
  * columns — the hot inner loop of every similarity operator.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) are
  * CodegenFallback: interpreted per row, materializing a temp array per
  * evaluation. This expression fuses the loop into whole-stage codegen:
  * one pass over the unsafe array data, double accumulation, no
  * allocation. Semantics are bit-identical to
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)), 0.0, _ + _)`
  * (left-to-right double accumulation over exact float→double casts),
  * which is also what the DuckDB oracle computes via
  * `list_dot_product(a::DOUBLE[], b::DOUBLE[])` — including on length
  * mismatch, where zip_with's null padding nulls the aggregate: VecDot
  * returns null there too, so dimension bugs surface instead of
  * yielding a truncated dot product.
  *
  * This file lives under org.apache.spark.sql only to reach the
  * `private[sql]` Column↔Expression bridge (ExpressionUtils); it uses
  * exclusively public Catalyst extension points otherwise.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // null on input null AND on length mismatch (matches the HOF
  // semantics: zip_with pads the shorter array with nulls, so the
  // aggregate sum goes null — a dimension bug surfaces, never a
  // silently truncated dot product)
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"vec_dot expects array<float|double>, got $t")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName: projection collapse can flatten several VecDots into
      // one codegen scope (e.g. two aggregate buffer expressions) —
      // fixed local names would redefine and Janino would reject,
      // silently dropping the stage to interpreted execution
      val n = ctx.freshName("vdN")
      val s = ctx.freshName("vdS")
      val i = ctx.freshName("vdI")
      val lGet = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val rGet = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ($lGet) * ($rGet);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecExpressions {
  /** Column-level dot product (see VecDot). */
  def vec_dot(a: Column, b: Column): Column =
    ExpressionUtils.column(VecDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
