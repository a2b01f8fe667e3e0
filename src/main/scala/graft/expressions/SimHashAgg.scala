package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** 32-bit SimHash as a TypedImperativeAggregate over shingle hashes: the
  * buffer is 32 signed counters; each input hash adds +1 to counter b when
  * its bit b is set, −1 otherwise; eval emits bit b iff counter b > 0.
  *
  * Bit-identical to the explode-formulation
  * (`shingles → ×32 bit rows → groupBy(doc,bit) → groupBy(doc)` — integer
  * arithmetic, order-independent), but runs in ONE shuffle with O(32)
  * partial state per group instead of materializing 32 rows per shingle
  * across two shuffles. At corpus scale that is 32× less shuffle input on
  * the fingerprint stage. (Summing ±1 per occurrence ≡ summing ±count per
  * distinct hash, so no pre-aggregation is needed either.)
  */
case class SimHashAgg(
    hashExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val Bits = 32

  override def children: Seq[Expression] = Seq(hashExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Bits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h = hashExpr.eval(input)
    if (h != null) {
      val hv = h.asInstanceOf[Long]
      var b = 0
      while (b < Bits) {
        if (((hv >> b) & 1L) == 1L) buf(b) += 1L else buf(b) -= 1L
        b += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var b = 0
    while (b < Bits) { buf(b) += other(b); b += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    var out = 0L
    var b = 0
    while (b < Bits) { if (buf(b) > 0) out |= 1L << b; b += 1 }
    out
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 * Bits)
    val out = new DataOutputStream(bos)
    var b = 0
    while (b < Bits) { out.writeLong(buf(b)); b += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](Bits)
    var b = 0
    while (b < Bits) { buf(b) = in.readLong(); b += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(hashExpr = newChildren.head)
}

object SimHashAgg {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** Column API: 32-bit simhash of the group's hash values. */
  def simhash_agg(h: Column): Column =
    column(SimHashAgg(expression(h)).toAggregateExpression())
}
