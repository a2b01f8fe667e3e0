package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd polynomial string hash:
  * h = fold(7, h·31 + char) mod 1000000007 over the string's UTF-16 code
  * units.
  *
  * Semantically identical to the higher-order-function formulation in
  * TextFunctions.stringHashHof (aggregate over split(s, "") with ascii())
  * for all BMP text, and to the DuckDB oracle's
  * list_reduce(list_transform(string_split(s, ''), c -> ascii(c)), …) —
  * but evaluated in a tight generated-Java loop with zero allocation,
  * instead of materializing a per-character array and interpreting a
  * lambda per element. On the shingle-heavy dedup queries this is the
  * difference between the hash dominating the job and the hash being
  * free (see BENCH notes in README).
  *
  * Extension path (b) of the preference order: a custom Expression with
  * doGenCode — no UDF, stays inside WholeStageCodegen.
  */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // Empty string: both Spark's split(s, "") and DuckDB's string_split
    // yield [''] whose ascii() is 0 → one fold step. Match that.
    if (s.isEmpty) 217L
    else {
      var h = 7L
      var i = 0
      // fold CODEPOINTS, not UTF-16 code units: split(s,"")+ascii() and
      // DuckDB's string_split+ascii both see one value per codepoint, so
      // surrogate pairs (non-BMP) must hash as a single number here too
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h = (h * 31L + cp) % 1000000007L
        i += Character.charCount(cp)
      }
      h
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val cp = ctx.freshName("cp")
      s"""
         |String $s = $c.toString();
         |long $h = 7L;
         |if ($s.isEmpty()) {
         |  $h = 217L;
         |} else {
         |  int $i = 0;
         |  while ($i < $s.length()) {
         |    int $cp = $s.codePointAt($i);
         |    $h = ($h * 31L + $cp) % 1000000007L;
         |    $i += Character.charCount($cp);
         |  }
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** Column API (Spark 4 classic Column↔Expression bridge). */
  def poly_hash(c: Column): Column = column(PolyHash(expression(c)))

  /** SQL registration: SELECT poly_hash(text) FROM ... */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poly_hash", exprs => PolyHash(exprs.head), "built-in")
}
