package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity pass-through that REPORTS itself non-deterministic so a
  * projection carrying it becomes opaque to predicate pushdown.
  *
  * Why it exists: `PushDownPredicates` substitutes a filter's attribute
  * references with the child projection's full expression trees on the
  * way down — with no cost model. Filtering a derived pipeline frame on a
  * computed flag (`route`'s `is_valid`, whose tree is the entire
  * validation chain: pyfloat parses, error-message concats, the synth
  * CASEs) therefore re-evaluates that whole chain inside the pushed
  * Filter at the scan, roughly tripling the ref_* query cost (measured
  * 2.6 s → 7.5 s at sf0.1).
  *
  * Mechanics (they matter): `PushPredicateThroughNonJoin` guards on the
  * PROJECT LIST's determinism — `fields.forall(_.deterministic)` — not
  * the predicate's, so wrapping the predicate alone does NOT stop the
  * rewrite. The working barrier is a `barrier(lit(true))` FIELD in the
  * projection under the filter, which the filter references as a
  * conjunct (`barrierCol && pred`) so column pruning cannot drop the
  * field and re-open the pushdown. Filter + projections still fuse into
  * one WholeStageCodegen stage; the only change is evaluation COUNT.
  *
  * Evaluation and codegen are exact pass-throughs of the child; the
  * expression never changes a value, only the optimizer's freedom.
  */
case class PushdownBarrier(child: Expression) extends UnaryExpression {
  // the one behavioral knob: "not deterministic" blocks predicate pushdown
  // (and any other expression-moving rewrite) without affecting results
  override lazy val deterministic: Boolean = false
  // never constant-folded away, even over a literal child (ConstantFolding
  // skips non-deterministic exprs, but be explicit: folding the barrier IS
  // the failure mode)
  override def foldable: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code = childGen.code, isNull = childGen.isNull, value = childGen.value)
  }

  override protected def withNewChildInternal(newChild: Expression): PushdownBarrier =
    copy(child = newChild)
}

object PushdownBarrier {
  /** Column API: `barrier(predicate)` — same value, pushdown-opaque. */
  def barrier(c: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      PushdownBarrier(org.apache.spark.sql.graft.bridge.expression(c)))

  /** `df.filter(pred)` that CANNOT be pushed below df's projection: the
    * barrier rides as a projection field referenced by the filter (see
    * class scaladoc for why the field, not the predicate, must carry it),
    * then is dropped. Use when `pred` references a column whose defining
    * expression is expensive (a parse, a tokenize, a dot product) — the
    * pushed-down substitution would re-evaluate that tree per reference.
    */
  def barrieredFilter(df: org.apache.spark.sql.DataFrame,
      pred: Column): org.apache.spark.sql.DataFrame =
    df.withColumn("__pushdown_barrier", barrier(org.apache.spark.sql.functions.lit(true)))
      .filter(org.apache.spark.sql.functions.col("__pushdown_barrier") && pred)
      .drop("__pushdown_barrier")
}
