package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonicalization (composed form) — the first step of any
  * text-normalization pipeline: decomposed sequences (`e` + U+0301) and
  * their composed equivalents (`é`) must fingerprint, dedup, and shingle
  * identically. Spark has no normalization built-in; this wraps the JDK's
  * `java.text.Normalizer` as a codegen'd Expression. Cross-engine safe:
  * Unicode's normalization-stability policy guarantees NFC of assigned
  * characters never changes between versions, so the JDK and DuckDB's
  * `nfc_normalize` (utf8proc) agree.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.NfcNormalize.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** Shared by interpreted and generated code. Fast path: NFC-check is
    * O(n) with no allocation, and most real text is already composed.
    */
  def nfc(u: UTF8String): UTF8String = {
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** Column API. */
  def nfc_normalize(c: Column): Column = column(NfcNormalize(expression(c)))

  /** SQL registration: SELECT nfc_normalize(s) FROM ... */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs.head), "built-in")
}
