package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Random-hyperplane LSH sign bits over an `array<double>` embedding:
  * bit j is set iff Σ_d emb[d]·coef(j,d) > 0, where coef is the
  * deterministic LCG ((1103515245·(j·4096+d) + 12345) mod 2^31)/2^31 − 0.5
  * (see operators/Similarity scaladoc for why stride 4096 and why the
  * arithmetic is exact in doubles).
  *
  * Bit-identical to the HOF formulation (Similarity.lshBucketsHof) and
  * the DuckDB oracle's bucketSql: the per-plane dot is the same strictly
  * sequential left fold (d = 0..n−1, acc + emb[d]·coef), so double
  * rounding agrees; the bit sum is integer. The HOF version is nested
  * `aggregate`/`transform` lambdas — CodegenFallback, interpreted
  * per-row, O(planes·dims) allocations; this is one generated loop with
  * zero allocation (extension path (b), the PolyHash pattern).
  *
  * NaN dots SET the bit: both Spark SQL and DuckDB order NaN greater
  * than every value, so the `acc > 0` in those engines is true for NaN —
  * raw Java `>` says false, which made the native diverge from the HOF
  * on NaN-poisoned vectors (caught by VectorPropertySpec); the explicit
  * isNaN keeps all three formulations identical.
  *
  * Array elements must be non-null (embeddings are dense vectors).
  */
case class RandomHyperplaneBits(child: Expression, planes: Int) extends UnaryExpression {
  require(planes >= 1 && planes <= 62, "planes must fit a positive long")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var bucket = 0L
    var j = 0
    while (j < planes) {
      var acc = 0.0d
      var d = 0
      while (d < n) {
        val coef =
          ((1103515245L * (j * 4096L + d) + 12345L) % 2147483648L).toDouble / 2147483648.0d - 0.5d
        acc += arr.getDouble(d) * coef
        d += 1
      }
      // Spark/DuckDB comparison semantics: NaN > 0 is TRUE (NaN greatest)
      if (acc > 0 || java.lang.Double.isNaN(acc)) bucket += 1L << j
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val b = ctx.freshName("bucket")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val coef = ctx.freshName("coef")
      s"""
         |int $n = $c.numElements();
         |long $b = 0L;
         |for (int $j = 0; $j < $planes; $j++) {
         |  double $acc = 0.0d;
         |  for (int $d = 0; $d < $n; $d++) {
         |    double $coef =
         |      (double) ((1103515245L * ($j * 4096L + $d) + 12345L) % 2147483648L)
         |        / 2147483648.0d - 0.5d;
         |    $acc += $c.getDouble($d) * $coef;
         |  }
         |  if ($acc > 0 || Double.isNaN($acc)) $b += 1L << $j;
         |}
         |${ev.value} = $b;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RandomHyperplaneBits =
    copy(child = newChild)
}

object RandomHyperplaneBits {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** Column API. */
  def hyperplane_bits(c: Column, planes: Int): Column =
    column(RandomHyperplaneBits(expression(c), planes))

  /** SQL registration (engine plane count): SELECT hyperplane_bits(emb). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hyperplane_bits",
      exprs => RandomHyperplaneBits(exprs.head, graft.operators.Similarity.NumPlanes),
      "built-in")
}
