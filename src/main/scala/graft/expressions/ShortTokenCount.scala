package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Count of tokens with at most `maxLen` characters in an
  * `array<string>` column — the short-token quality signal. The last
  * lambda HOF on the text hot path (`size(filter(toks, length ≤ n))` is
  * CodegenFallback) replaced by one generated loop; `numChars` counts
  * codepoint-independent character length exactly like `length()`.
  * Array elements must be non-null (tokenizer output).
  */
case class ShortTokenCount(child: Expression, maxLen: Int) extends UnaryExpression {
  require(maxLen >= 0, "maxLen must be non-negative")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var count = 0L
    var i = 0
    while (i < n) {
      if (arr.getUTF8String(i).numChars() <= maxLen) count += 1L
      i += 1
    }
    count
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $n = $c.numElements();
         |long $cnt = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($c.getUTF8String($i).numChars() <= $maxLen) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShortTokenCount =
    copy(child = newChild)
}

object ShortTokenCount {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  def short_token_count(toks: Column, maxLen: Int): Column =
    column(ShortTokenCount(expression(toks), maxLen))
}
