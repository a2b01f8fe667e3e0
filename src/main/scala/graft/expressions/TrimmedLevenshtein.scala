package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Banded Levenshtein with common-prefix/suffix stripping — a drop-in
  * for the built-in 3-arg `levenshtein(a, b, k)` that pays only for the
  * DIFFERING middle of the two strings.
  *
  * Why: an optimal alignment can always be taken to match a shared
  * prefix and a shared suffix position-for-position, so stripping both
  * preserves the distance EXACTLY (the standard reduction in
  * python-Levenshtein / commons-text). The near-dup verify feeds this
  * expression pairs that are near-copies BY CONSTRUCTION (they passed
  * LSH banding), typically differing only in a short tail or a few
  * in-place edits — the O(len·k) banded DP over the full ~n-char texts
  * then does >90% of its work re-matching identical characters. After
  * the trim, the DP runs over just the differing middle: an
  * appended-tail near-dup costs O(tail²) instead of O(len·k).
  *
  * Exactness: the residual distance is computed by Spark's own
  * `UTF8String.levenshteinDistance(other, k)` — the same kernel the
  * built-in uses — so results are identical by the trim-preservation
  * property plus same-kernel arithmetic: d ≤ k returns d, d > k returns
  * −1 (the length gate |len_a − len_b| > k short-circuits to −1 before
  * any allocation, subsuming the DataFrame-level gate). Equality with
  * the built-in is pinned corpus-wide and on adversarial strings
  * (surrogate pairs ride codepoint-boundary trimming — a shared HIGH
  * surrogate inside differing non-BMP codepoints must NOT be split).
  *
  * Extension path (b): custom Expression, stays inside
  * WholeStageCodegen via a static helper call (the PyFloat pattern).
  */
case class TrimmedLevenshtein(left: Expression, right: Expression, threshold: Int)
    extends BinaryExpression {
  // threshold < 0 = UNBOUNDED: exact distance through the non-banded
  // kernel — for argmin searches (ER best-match) where no bar exists
  // but the trim still pays (blocked candidates share their blocking
  // words as a common prefix)

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "trimmed_levenshtein"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TrimmedLevenshtein.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.TrimmedLevenshtein.compute($a, $b, $threshold);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TrimmedLevenshtein =
    copy(left = newLeft, right = newRight)
}

object TrimmedLevenshtein {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** Called from generated code — keep static (companion forwarder). */
  def compute(ua: UTF8String, ub: UTF8String, maxDist: Int): Int = {
    // length gate first: distance >= |numChars delta|, no allocation
    // needed (bounded mode only — unbounded mode always computes)
    val delta = ua.numChars() - ub.numChars()
    if (maxDist >= 0 && (delta > maxDist || delta < -maxDist)) return -1
    val sa = ua.toString
    val sb = ub.toString
    // common-prefix trim on CODEPOINTS: advancing by Character.charCount
    // of the shared codepoint keeps both cursors on codepoint boundaries,
    // so a shared high surrogate inside two DIFFERENT non-BMP codepoints
    // is never split off as a "common" prefix
    var lo = 0
    var scan = true
    while (scan && lo < sa.length && lo < sb.length) {
      val ca = sa.codePointAt(lo)
      if (sb.codePointAt(lo) == ca) lo += Character.charCount(ca)
      else scan = false
    }
    // common-suffix trim, same discipline from the right
    var ea = sa.length
    var eb = sb.length
    scan = true
    while (scan && ea > lo && eb > lo) {
      val ca = sa.codePointBefore(ea)
      if (sb.codePointBefore(eb) == ca) {
        val w = Character.charCount(ca)
        ea -= w; eb -= w
      } else scan = false
    }
    if (ea == lo && eb == lo) return 0 // identical strings
    // residual distance through Spark's own kernels — identical
    // arithmetic to the built-in levenshtein(a, b[, k])
    val ta = UTF8String.fromString(sa.substring(lo, ea))
    val tb = UTF8String.fromString(sb.substring(lo, eb))
    if (maxDist < 0) ta.levenshteinDistance(tb)
    else ta.levenshteinDistance(tb, maxDist)
  }

  /** Column API; negative maxDist = unbounded exact distance. */
  def trimmed_levenshtein(a: Column, b: Column, maxDist: Int): Column =
    column(TrimmedLevenshtein(expression(a), expression(b), maxDist))

  /** Unbounded exact distance (the 2-arg `levenshtein` drop-in). */
  def trimmed_levenshtein(a: Column, b: Column): Column =
    trimmed_levenshtein(a, b, -1)

  // SQL registration lives in expressions.Registry (the single
  // registration site, with validated integer-literal extraction)
}
