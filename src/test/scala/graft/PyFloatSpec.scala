package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.PyFloat

/** PyFloat must reproduce CPython `float(str)` bit-for-bit on the
  * generated truth table (src/test/resources/pyfloat_cases.tsv — 590
  * curated + fuzzed inputs with CPython 3.11 results captured as hex
  * floats), in BOTH the interpreted and the codegen evaluation paths.
  */
class PyFloatSpec extends SparkSpec {
  import spark.implicits._

  /** (input, expected): expected None = ValueError, Some(bits) = the
    * IEEE-754 bit pattern CPython produced (NaN canonicalized).
    */
  private lazy val cases: Seq[(String, Option[Long])] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/pyfloat_cases.tsv"), "UTF-8")
    try src.getLines().toList.map { line =>
      val Array(esc, exp) = line.split("\t", 2)
      // unescape \uXXXX and backslash
      val sb = new StringBuilder
      var i = 0
      while (i < esc.length) {
        if (esc.charAt(i) == '\\' && i + 1 < esc.length) {
          if (esc.charAt(i + 1) == 'u') {
            sb.append(Integer.parseInt(esc.substring(i + 2, i + 6), 16).toChar); i += 6
          } else { sb.append(esc.charAt(i + 1)); i += 2 }
        } else { sb.append(esc.charAt(i)); i += 1 }
      }
      val expected = exp match {
        case "NULL" => None
        case "nan"  => Some(java.lang.Double.doubleToLongBits(Double.NaN))
        case "inf"  => Some(java.lang.Double.doubleToLongBits(Double.PositiveInfinity))
        case "-inf" => Some(java.lang.Double.doubleToLongBits(Double.NegativeInfinity))
        case hex    => Some(java.lang.Double.doubleToLongBits(java.lang.Double.parseDouble(hex)))
      }
      (sb.toString, expected)
    } finally src.close()
  }

  private def bits(d: java.lang.Double): Option[Long] =
    Option(d).map(v => java.lang.Double.doubleToLongBits(v.doubleValue()))

  test("interpreted path matches CPython on all fixture cases") {
    val bad = cases.filter { case (in, exp) =>
      bits(PyFloat.parseOrNull(UTF8String.fromString(in))) != exp
    }
    assert(bad.isEmpty, s"mismatches (first 10): ${bad.take(10)}")
  }

  test("codegen path (DataFrame) matches CPython on all fixture cases") {
    val df = cases.map(_._1).toDF("s")
      .select($"s", PyFloat.py_float($"s").as("d"))
    val got = df.collect().map(r =>
      r.getString(0) -> (if (r.isNullAt(1)) None
                         else Some(java.lang.Double.doubleToLongBits(r.getDouble(1))))).toMap
    val bad = cases.filter { case (in, exp) => got(in) != exp }
    assert(bad.isEmpty, s"mismatches (first 10): ${bad.take(10)}")
  }

  test("SQL registration works") {
    PyFloat.register(spark)
    assert(spark.sql("SELECT py_float(' 1_000.5 ') AS d").as[Double].head() === 1000.5)
    assert(spark.sql("SELECT py_float('-infinity') AS d").as[Double].head().isNegInfinity)
    assert(spark.sql("SELECT py_float('1d') AS d").collect()(0).isNullAt(0))
  }

  test("null input propagates") {
    val r = Seq[Option[String]](None).toDF("s").select(PyFloat.py_float($"s")).collect()
    assert(r(0).isNullAt(0))
  }
}
