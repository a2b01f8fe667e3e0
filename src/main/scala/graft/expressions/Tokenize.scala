package graft.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass whitespace tokenizer: lowercase, split on the explicit
  * whitespace class {space, \t, \n, \f, \r}, drop empties — byte-exact
  * with the built-ins formulation
  * `array_remove(split(trim(lower(text)), "[ \t\n\f\r]+"), "")`
  * (TokenizeSpec pins the equivalence on the corpus and on edge cases).
  *
  * Why native: tokenization is the inner loop of every text operator in
  * the engine (quality scoring, packing, chunking, shingling, language
  * ID), and the built-ins spelling makes four passes with three
  * intermediate copies per row — lower (copy), trim (copy), regex split
  * (regex engine + array), array_remove (array scan + rebuild). This is
  * one lowercase followed by one byte scan collecting non-empty runs.
  * The lowercase is `CollationAwareUTF8String.toLowerCase` — the SAME
  * entry point the `lower` built-in uses under Spark 4's default ICU
  * case mapping (ASCII fast path, ICU tables otherwise). It is NOT
  * `UTF8String.toLowerCase`: that one falls back to JDK
  * `String.toLowerCase`, whose older Unicode tables diverge from ICU on
  * recent case pairs (e.g. U+1C89 CYRILLIC CAPITAL TJE → U+1C8A, a
  * Unicode 16 mapping the JDK lacks — caught by TextPropertySpec's
  * random-codepoint property). The five separator bytes are ASCII, and
  * UTF-8 continuation/lead bytes are all ≥ 0x80, so the byte scan can
  * never split inside a multi-byte code point.
  *
  * Codegen calls the same static scanner the interpreted path uses (the
  * Cast/PyFloat pattern: one scalar helper, no UDF, no per-row boxing
  * beyond the output array itself).
  */
case class Tokenize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    Tokenize.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Tokenize.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): Tokenize =
    copy(child = newChild)
}

object Tokenize {

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\f' || b == '\r'

  /** Static scanner shared by eval and generated code. */
  def tokenize(s: UTF8String): ArrayData = {
    val bytes = org.apache.spark.sql.catalyst.util.CollationAwareUTF8String
      .toLowerCase(s).getBytes
    val n = bytes.length
    val out = new ArrayBuffer[Any](8)
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) out += UTF8String.fromBytes(bytes, start, i - start)
    }
    new GenericArrayData(out.toArray)
  }

  /** Column API. */
  def tokenize(c: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      Tokenize(org.apache.spark.sql.graft.bridge.expression(c)))
}
