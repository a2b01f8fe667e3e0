package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Asymmetric-distance (ADC) score: Σ_s qd[s·C + codes[s]] over a
  * query's flattened per-subspace distance table `qd` (m·C doubles in
  * (s, li) order) and a candidate's m-code array — the inner loop of
  * every PQ ANN scan (`knnPq`, `knnIvfPq`, `knnIvfPqResidual` and its
  * trained-cell variant). C falls out of the table shape
  * (C = len(qd) / m), exactly as the HOF spelling derives it.
  *
  * Why native: the `aggregate(sequence(0, m−1), 0.0, …)` HOF this
  * replaces is a CodegenFallback — every candidate row pays m
  * interpreted lambda frames plus a materialized sequence array, ON THE
  * HOTTEST PATH of the engine (the per-(query, candidate) scoring join:
  * |Q|·occupancy rows). This is one generated loop of array reads —
  * the SeqDot/TrimmedLevenshtein discipline applied to the ADC.
  *
  * Exactness: accumulates left-to-right in subspace order from 0.0 —
  * the identical double-addition sequence as the HOF fold (kept as
  * `Similarity.adcExprHof` and parity-pinned in VectorPropertySpec) and
  * as the DuckDB mirror's `list_reduce(list_prepend(0.0, …))`. Null or
  * out-of-range anywhere → null, the HOF's null-propagation semantics.
  */
case class AdcLookup(left: Expression, right: Expression, m: Int)
  extends BinaryExpression
  with org.apache.spark.sql.graft.ArrayDoubleIntBinaryInputTypes {
  require(m > 0, "subspace count must be positive")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_lookup"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val qd = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val n = qd.numElements()
    val c = n / m
    if (codes.numElements() < m) return null
    var acc = 0.0d
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val idx = s * c + codes.getInt(s)
      if (idx < 0 || idx >= n || qd.isNullAt(idx)) return null
      acc += qd.getDouble(idx)
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val n = ctx.freshName("n")
    val c = ctx.freshName("c")
    val s = ctx.freshName("s")
    val idx = ctx.freshName("idx")
    val acc = ctx.freshName("acc")
    val ok = ctx.freshName("ok")
    ev.copy(code =
      code"""
         |${leftGen.code}
         |${rightGen.code}
         |boolean ${ev.isNull} = true;
         |double ${ev.value} = 0.0;
         |if (!${leftGen.isNull} && !${rightGen.isNull} &&
         |    ${rightGen.value}.numElements() >= $m) {
         |  int $n = ${leftGen.value}.numElements();
         |  int $c = $n / $m;
         |  double $acc = 0.0d;
         |  boolean $ok = true;
         |  for (int $s = 0; $s < $m; $s++) {
         |    if (${rightGen.value}.isNullAt($s)) { $ok = false; break; }
         |    int $idx = $s * $c + ${rightGen.value}.getInt($s);
         |    if ($idx < 0 || $idx >= $n || ${leftGen.value}.isNullAt($idx)) {
         |      $ok = false; break;
         |    }
         |    $acc += ${leftGen.value}.getDouble($idx);
         |  }
         |  if ($ok) { ${ev.isNull} = false; ${ev.value} = $acc; }
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcLookup =
    copy(left = newLeft, right = newRight)
}

object AdcLookup {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** Column API: ADC score of `codes` against the flattened table `qd`. */
  def adc_lookup(qd: Column, codes: Column, m: Int): Column =
    column(AdcLookup(expression(qd), expression(codes), m))
}
