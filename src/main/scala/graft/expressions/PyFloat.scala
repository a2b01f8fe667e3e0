package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** CPython-`float(str)`-parity string→double parse, null on failure — the
  * bit-exact version of the reference's `is_valid_number`/`float()` seam
  * (ref: src/app/order_validator.py:146-163), where `try_cast` diverges:
  *
  *  - accepts `inf`/`infinity`/`nan` in any case, with sign (`try_cast`
  *    takes Java's `Infinity` spelling, not `inf`);
  *  - accepts PEP 515 underscores strictly BETWEEN digits (`1_000`,
  *    `1_0.5_5e1_0`) and rejects `_1`, `1_`, `1__0`, `1_.5`, `1e_5`;
  *  - rejects Java-isms `try_cast` tolerates: `1d`, `1f`, hex forms;
  *  - strips exactly Python's whitespace set (incl. `\\x1c`–`\\x1f`, NBSP,
  *    unicode spaces) — not arbitrary control chars.
  *
  * Overflow parses to ±inf and underflow to 0.0 (CPython strtod and Java
  * `Double.parseDouble` are both correctly rounded, so values agree
  * bit-for-bit once the grammar is validated). Known divergence: CPython
  * also accepts non-ASCII unicode DIGITS (e.g. ٣); this accepts ASCII
  * digits only.
  *
  * Codegen calls the same static parser the interpreted path uses
  * (the Cast pattern: one scalar helper, no UDF, no boxing in the loop) —
  * property-fuzzed against a CPython-generated truth table
  * (src/test/resources/pyfloat_cases.tsv) on both paths.
  */
case class PyFloat(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else PyFloat.parseOrNull(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("pyf")
    ev.copy(code =
      code"""
         |${childGen.code}
         |boolean ${ev.isNull} = true;
         |double ${ev.value} = 0.0;
         |if (!${childGen.isNull}) {
         |  Double $boxed = graft.expressions.PyFloat.parseOrNull(${childGen.value});
         |  if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.doubleValue(); }
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PyFloat =
    copy(child = newChild)
}

object PyFloat {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** Column API. */
  def py_float(c: Column): Column = column(PyFloat(expression(c)))

  /** SQL registration: SELECT py_float(s) FROM ... */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "py_float", exprs => PyFloat(exprs.head), "built-in")

  /** The whitespace float(str) strips: ASCII Py_ISSPACE is just
    * ` \t\n\v\f\r` (0x1c–0x1f are isspace() for str but REJECTED by
    * float()), while non-ASCII Py_UNICODE_ISSPACE chars are mapped to
    * space by the decimal-transform pass and accepted.
    */
  private def isPySpace(c: Char): Boolean = c match {
    case ' ' | '\t' | '\n' | '\u000b' | '\f' | '\r' => true
    case '\u0085' | '\u00a0' | '\u1680' | '\u2028' | '\u2029' | '\u202f' |
         '\u205f' | '\u3000' => true
    case _ => c >= '\u2000' && c <= '\u200a'
  }

  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  /** Consume `digit (('_')? digit)*` from `i`, appending digits (sans
    * underscores) to `sb`. Returns the index after the run; `start` if the
    * run is empty; -1 on a malformed underscore.
    */
  private def scanDigitRun(s: String, start: Int, end: Int, sb: java.lang.StringBuilder): Int = {
    var i = start
    if (i >= end || !isDigit(s.charAt(i))) return start
    sb.append(s.charAt(i)); i += 1
    while (i < end) {
      val c = s.charAt(i)
      if (isDigit(c)) { sb.append(c); i += 1 }
      else if (c == '_') {
        if (i + 1 < end && isDigit(s.charAt(i + 1))) { sb.append(s.charAt(i + 1)); i += 2 }
        else return -1
      } else return i
    }
    i
  }

  /** CPython float(str) semantics; null (ValueError) on anything the
    * Python grammar rejects. Called from generated code — keep static.
    */
  def parseOrNull(u: UTF8String): java.lang.Double = {
    if (u == null) return null
    val s = u.toString
    var a = 0
    var b = s.length
    while (a < b && isPySpace(s.charAt(a))) a += 1
    while (b > a && isPySpace(s.charAt(b - 1))) b -= 1
    if (a >= b) return null
    var i = a
    var neg = false
    val c0 = s.charAt(i)
    if (c0 == '+' || c0 == '-') { neg = c0 == '-'; i += 1 }
    if (i >= b) return null
    val cc = s.charAt(i)
    if (cc == 'i' || cc == 'I') {
      val len = b - i
      if ((len == 3 && s.regionMatches(true, i, "inf", 0, 3)) ||
          (len == 8 && s.regionMatches(true, i, "infinity", 0, 8)))
        return java.lang.Double.valueOf(
          if (neg) Double.NegativeInfinity else Double.PositiveInfinity)
      return null
    }
    if (cc == 'n' || cc == 'N') {
      if (b - i == 3 && s.regionMatches(true, i, "nan", 0, 3))
        return java.lang.Double.valueOf(Double.NaN) // float("-nan") is nan
      return null
    }
    val sb = new java.lang.StringBuilder(b - a)
    if (neg) sb.append('-')
    var j = scanDigitRun(s, i, b, sb)
    if (j == -1) return null
    val hasInt = j > i
    var hasFrac = false
    if (j < b && s.charAt(j) == '.') {
      sb.append('.'); j += 1
      val r = scanDigitRun(s, j, b, sb)
      if (r == -1) return null
      hasFrac = r > j
      j = r
    }
    if (!hasInt && !hasFrac) return null
    if (j < b && (s.charAt(j) == 'e' || s.charAt(j) == 'E')) {
      sb.append('e'); j += 1
      if (j < b && (s.charAt(j) == '+' || s.charAt(j) == '-')) { sb.append(s.charAt(j)); j += 1 }
      val r = scanDigitRun(s, j, b, sb)
      if (r == -1 || r == j) return null
      j = r
    }
    if (j != b) return null
    java.lang.Double.valueOf(java.lang.Double.parseDouble(sb.toString))
  }
}
