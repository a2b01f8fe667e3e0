package graft.expressions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking of a text into variable-size token-aligned
  * chunks, computed in one fused pass: split on single spaces (byte-exact
  * with DuckDB `string_split(text, ' ')` — NO lowercasing or whitespace
  * classes, chunks must reproduce the original text), then close a chunk
  * after every BOUNDARY token, where a token is a boundary iff its MD5's
  * first hex digit is '0' or '1' (first digest byte < 0x20, P = 1/8 →
  * expected chunk length 8 tokens).
  *
  * Why content-defined instead of [[graft.operators.Curation]]'s
  * fixed-stride chunks: boundaries depend only on token CONTENT, so
  * inserting or deleting tokens perturbs chunking only up to the next
  * boundary — every later chunk is byte-identical and deduplicates
  * against the unedited copy. Fixed-stride blocks shift globally on a
  * one-token edit and nothing downstream matches (the rsync/LBFS
  * boundary argument, applied at token granularity so the chunk stream
  * is portable to a SQL oracle via `md5()`, which Spark and DuckDB both
  * ship).
  *
  * Scale shape: a pure narrow map — `explode(cdc_chunks(text))` streams
  * the chunk list with no token shuffle and no per-doc window, same
  * contract as [[ShingleHashes]]. MD5 is per DISTINCT token occurrence
  * only (no rolling window re-hash), and the digest object is
  * thread-local, not per-row.
  *
  * Fewer than 1 token never happens: `split(" ", -1)` yields [""] for
  * empty text, which hashes to a non-boundary, so output is always ≥ 1
  * chunk and `array_join(chunks, " ")` reconstructs the input exactly
  * (CdcChunksSpec pins both).
  */
case class CdcChunks(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    CdcChunks.chunks(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.CdcChunks.chunks($c)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {

  // MessageDigest is stateful; one instance per executor thread, reset per
  // token — getInstance() per row would dominate the scan.
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Boundary test shared with the spec: MD5 first hex digit < '2'. */
  def isBoundary(token: String): Boolean = {
    val md = md5.get()
    md.reset()
    (md.digest(token.getBytes(StandardCharsets.UTF_8))(0) & 0xFF) < 0x20
  }

  /** Static scanner shared by eval and generated code. */
  def chunks(s: UTF8String): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val out = new ArrayBuffer[UTF8String](toks.length / 6 + 1)
    val sb = new java.lang.StringBuilder
    var open = false // tokens accumulated since the last boundary
    var i = 0
    while (i < toks.length) {
      if (open) sb.append(' ')
      sb.append(toks(i))
      open = true
      if (isBoundary(toks(i))) {
        out += UTF8String.fromString(sb.toString)
        sb.setLength(0)
        open = false
      }
      i += 1
    }
    if (open) out += UTF8String.fromString(sb.toString)
    new GenericArrayData(out.toArray[Any])
  }

  /** Column API. */
  def cdc_chunks(c: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      CdcChunks(org.apache.spark.sql.graft.bridge.expression(c)))
}
