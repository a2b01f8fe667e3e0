package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Strictly sequential squared-L2 distance over two `array<double>`
  * columns — the inner loop of the k-means/IVF family (cell assignment
  * probes every vector against k centroids per iteration, the
  * silhouette audit against the 2 nearest, staleness against frozen
  * snapshots). Same contract as [[SeqDot]]: left-to-right accumulation
  * in index order, bit-identical to the
  * `aggregate(zip_with(a,b,(x,y)=>(x−y)·(x−y)), 0.0, _+_)` HOF
  * formulation (kept as VectorFunctions.l2sqHof for the cross-check)
  * and to the DuckDB oracle's `list_reduce(list_prepend(0.0, …))` —
  * but one generated loop per pair instead of interpreted lambdas
  * materializing a zipped array.
  *
  * Mismatched lengths AND null elements yield null — exactly the HOF's
  * semantics (zip_with pads with null and a null element nulls the
  * fold), so swapping a call site between the two forms can never
  * change null behavior: a sparse/corrupt vector falls out of distance
  * rankings instead of contributing a silently-wrong finite distance.
  */
case class SeqL2Sq(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.graft.ArrayDoubleBinaryInputTypes {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "seq_l2sq"

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
        val diff = x.getDouble(d) - y.getDouble(d)
        acc += diff * diff
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
    val diff = ctx.freshName("diff")
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
         |      double $diff = ${leftGen.value}.getDouble($d) - ${rightGen.value}.getDouble($d);
         |      $acc += $diff * $diff;
         |    }
         |    if ($ok) { ${ev.isNull} = false; ${ev.value} = $acc; }
         |  }
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SeqL2Sq =
    copy(left = newLeft, right = newRight)
}

object SeqL2Sq {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** Column API. */
  def seq_l2sq(a: Column, b: Column): Column = column(SeqL2Sq(expression(a), expression(b)))
}
