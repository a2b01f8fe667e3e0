package graft.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Word-trigram shingle hashes of a text, as one array<long> computed in
  * a single fused pass: lowercase → whitespace tokenize (same class as
  * [[Tokenize]]) → for every 3-token window, the [[PolyHash]] codepoint
  * fold over "tok_i tok_i+1 tok_i+2" (single-space joined). Fewer than 3
  * tokens → empty array.
  *
  * Byte-exact with the composed formulation
  * `stringHash(concat_ws(" ", w, lead(w,1), lead(w,2)))` over
  * `posexplode(tokens(text))` — ShingleSpec pins the per-doc multiset
  * equality — but with NO exploded token stream, NO per-doc window, and
  * therefore NO shuffle before the downstream aggregation: the shingle
  * stream becomes `explode(shingle_hashes(text))`, a pure narrow map.
  * At 100 TB that removes the largest pre-aggregation exchange in the
  * dedup suite (the exploded token stream is ~50× the corpus rows).
  *
  * The fold re-hashes each token's codepoints once per window it appears
  * in (3× total text work) — the alternative, composing per-token hashes
  * with modular powers, saves nothing at these token lengths and costs a
  * divergence risk against the string-level oracle definition.
  */
case class ShingleHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.shingleHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ShingleHashes.shingleHashes($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** [[ShingleHashes]] at an arbitrary gram width — the same fused
  * lowercase→tokenize→window-hash pass with `width`-token windows.
  * Byte-exact with `stringHash(concat_ws(" ", slice(tokens(text), i,
  * width)))` per start position (the repeatedSpans seed rule); fewer
  * than `width` tokens → empty array. Used where the trigram default
  * doesn't fit (ExactSubstr seeds use 5-grams to keep accidental
  * vocabulary collisions negligible).
  */
case class GramHashes(child: Expression, width: Int) extends UnaryExpression {
  require(width >= 1, "gram width must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "gram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.gramHashes(input.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ShingleHashes.gramHashes($c, $width)")

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

object GramHashes {
  /** Column API. */
  def gram_hashes(c: Column, width: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      GramHashes(org.apache.spark.sql.graft.bridge.expression(c), width))
}

object ShingleHashes {

  val P = 1000000007L
  private val N = 3 // word-trigram shingles

  @inline private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == '\f' || cp == '\r'

  /** Static scanner shared by eval and generated code (trigram form). */
  def shingleHashes(s: UTF8String): ArrayData = gramHashes(s, N)

  /** Width-parameterized scanner (see [[GramHashes]]). */
  def gramHashes(s: UTF8String, width: Int): ArrayData = {
    // lowercase through the same entry point as the lower() built-in —
    // CollationAwareUTF8String (ICU tables), NOT UTF8String.toLowerCase
    // (JDK tables; diverges on recent case pairs, see Tokenize) — then
    // walk CODEPOINTS (PolyHash's fold unit — surrogate pairs hash as
    // one value)
    val str = org.apache.spark.sql.catalyst.util.CollationAwareUTF8String
      .toLowerCase(s).toString
    val toks = new ArrayBuffer[Array[Int]](16)
    var cur = new ArrayBuffer[Int](16)
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (isWs(cp)) {
        if (cur.nonEmpty) { toks += cur.toArray; cur = new ArrayBuffer[Int](16) }
      } else cur += cp
      i += Character.charCount(cp)
    }
    if (cur.nonEmpty) toks += cur.toArray
    val m = toks.length - width + 1
    if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](m)
    var k = 0
    while (k < m) {
      var h = 7L
      var t = 0
      while (t < width) {
        if (t > 0) h = (h * 31L + ' ') % P
        val cps = toks(k + t)
        var j = 0
        while (j < cps.length) { h = (h * 31L + cps(j)) % P; j += 1 }
        t += 1
      }
      out(k) = h
      k += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Column API. */
  def shingle_hashes(c: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      ShingleHashes(org.apache.spark.sql.graft.bridge.expression(c)))
}
