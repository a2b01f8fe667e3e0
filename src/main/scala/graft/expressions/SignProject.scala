package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Sign-matrix Johnson–Lindenstrauss projection of an `array<double>`
  * embedding down to `outDims` coordinates:
  *
  *   proj[j] = (Σ_d ±emb[d]) / sqrt(outDims)
  *
  * where the sign for (plane j, dim d) is the high bit of the same
  * deterministic LCG family the LSH hyperplanes use
  * (Achlioptas'01: iid ±1 entries satisfy the JL lemma with the same
  * distortion bounds as Gaussians, and need no float coefficient table).
  * Plane indices are offset by [[SignProject.PlaneOffset]] so the sign
  * matrix shares no LCG states with [[RandomHyperplaneBits]]' planes
  * 0..61 — correlated matrices would make the LSH bucket a deterministic
  * function of the projection's signs and quietly bias any audit that
  * composes the two.
  *
  * Exactness contract (the oracle compares raw doubles): the per-plane
  * sum is the house strictly-sequential left fold (d = 0..n−1), a sign
  * flip is exact in IEEE, and the final scale is one correctly-rounded
  * division by a correctly-rounded sqrt — so the DuckDB mirror
  * reproduces every output bit. No transcendentals beyond sqrt.
  *
  * Why native: the HOF spelling (transform over range × aggregate over
  * dims) is nested lambdas — CodegenFallback, interpreted per row,
  * O(outDims·dims) allocations (the q_doc_winnow lesson: a
  * narrow-but-interpreted pass can lose to a shuffle). This is one
  * generated loop pair with a single output allocation.
  *
  * Null array → null; null elements inside the array yield a null
  * projection (same posture as [[SeqDot]]: corrupt vectors fall out
  * instead of projecting to a silently-wrong finite vector).
  */
case class SignProject(child: Expression, outDims: Int)
  extends UnaryExpression
  with org.apache.spark.sql.graft.ArrayDoubleUnaryInputTypes {
  require(outDims >= 1, "outDims must be positive")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "sign_project"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SignProject.project(arr, outDims)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      s"""
         |ArrayData $out =
         |  graft.expressions.SignProject.project($c, $outDims);
         |if ($out == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignProject =
    copy(child = newChild)
}

object SignProject {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** First LCG plane index used by the sign matrix — past
    * [[RandomHyperplaneBits]]' maximum of 62 planes, so the two
    * deterministic matrices never share an LCG state.
    */
  val PlaneOffset = 64

  /** Static kernel shared by eval and generated code (the Tokenize
    * pattern). Returns null when any element is null.
    */
  def project(arr: ArrayData, outDims: Int): ArrayData = {
    val n = arr.numElements()
    // The per-plane LCG stride is 4096: plane j at dim d seeds from
    // (j + PlaneOffset) * 4096 + d, which separates planes only while
    // n <= 4096 — beyond that, plane j at dim d would reuse plane j+1's
    // state at d - 4096, correlating sign-matrix rows and silently
    // voiding the JL guarantee. Fail loudly instead.
    require(n <= 4096, s"sign_project supports at most 4096 input dims, got $n")
    var d = 0
    while (d < n) {
      if (arr.isNullAt(d)) return null
      d += 1
    }
    val scale = Math.sqrt(outDims.toDouble)
    val out = new Array[Double](outDims)
    var j = 0
    while (j < outDims) {
      var acc = 0.0d
      d = 0
      while (d < n) {
        val r = (1103515245L * ((j + PlaneOffset) * 4096L + d) + 12345L) % 2147483648L
        val v = arr.getDouble(d)
        acc += (if (r >= 1073741824L) v else -v)
        d += 1
      }
      out(j) = acc / scale
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column API. */
  def sign_project(c: Column, outDims: Int): Column =
    column(SignProject(expression(c), outDims))

  /** SQL registration (engine default dimension count):
    * SELECT sign_project(emb).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sign_project",
      exprs => SignProject(exprs.head, graft.operators.Similarity.JlDims),
      "built-in")

  /** DuckDB mirror of the projection over list expression `e` (already
    * `DOUBLE`s) — same LCG high-bit signs, same left fold, same final
    * division; `sqrt(CAST(.. AS DOUBLE))` is correctly rounded in both
    * engines so every bit agrees.
    */
  def projectSql(e: String, outDims: Int): String =
    s"""list_transform(range(0, $outDims), j ->
       |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |    list_transform(range(0, len($e)), d ->
       |      CASE WHEN (1103515245 * ((j + $PlaneOffset) * 4096 + d) + 12345) % 2147483648 >= 1073741824
       |           THEN $e[d+1] ELSE -$e[d+1] END)),
       |    (a, b) -> a + b) / sqrt(CAST($outDims AS DOUBLE)))""".stripMargin
}
