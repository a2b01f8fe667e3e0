package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Strictly sequential dot product over two `array<double>` columns —
  * the inner loop of every similarity pair (kNN, ANN verify, near-dup
  * cosine). Accumulates left-to-right in index order, so the result is
  * bit-identical to the `aggregate(zip_with(a,b,_*_), 0.0, _+_)` HOF
  * formulation (kept as VectorFunctions.dotHof) and to the DuckDB
  * oracle's `list_reduce(list_prepend(0.0, …))` — but runs as one
  * generated loop instead of interpreted lambdas materializing a zipped
  * array per pair.
  *
  * Mismatched lengths AND null elements yield null — exactly the HOF's
  * semantics (zip_with pads with null and a null element nulls the
  * fold): a sparse/corrupt vector falls out of similarity rankings
  * instead of contributing a silently-wrong finite score.
  */
case class SeqDot(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.graft.ArrayDoubleBinaryInputTypes {
  // input types declared via the bridge mixin: array<double> with
  // implicit casting, so a raw array<float> embedding column is cast by
  // analysis instead of getDouble() misreading 4-byte slots
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0d
      var d = 0
      while (d < n) {
        if (x.isNullAt(d) || y.isNullAt(d)) return null
        acc += x.getDouble(d) * y.getDouble(d)
        d += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val n = ctx.freshName("n")
    val d = ctx.freshName("d")
    val acc = ctx.freshName("acc")
    val ok = ctx.freshName("ok")
    ev.copy(code =
      code"""
         |${leftGen.code}
         |${rightGen.code}
         |boolean ${ev.isNull} = true;
         |double ${ev.value} = 0.0;
         |if (!${leftGen.isNull} && !${rightGen.isNull}) {
         |  int $n = ${leftGen.value}.numElements();
         |  if ($n == ${rightGen.value}.numElements()) {
         |    double $acc = 0.0d;
         |    boolean $ok = true;
         |    for (int $d = 0; $d < $n; $d++) {
         |      if (${leftGen.value}.isNullAt($d) || ${rightGen.value}.isNullAt($d)) {
         |        $ok = false; break;
         |      }
         |      $acc += ${leftGen.value}.getDouble($d) * ${rightGen.value}.getDouble($d);
         |    }
         |    if ($ok) { ${ev.isNull} = false; ${ev.value} = $acc; }
         |  }
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SeqDot =
    copy(left = newLeft, right = newRight)
}

object SeqDot {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** Column API. */
  def seq_dot(a: Column, b: Column): Column = column(SeqDot(expression(a), expression(b)))
}
