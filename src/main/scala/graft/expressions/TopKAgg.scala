package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact per-group top-k as a TypedImperativeAggregate: returns the ids of
  * the k largest values (value desc, ties broken by smaller id — fully
  * deterministic, so the result is DuckDB-oracle comparable:
  * `list(id ORDER BY value DESC, id)[1:k]`).
  *
  * Why a custom aggregate instead of `collect_list` + sort + slice: the
  * buffer here is a bounded k-element heap, so map-side partial
  * aggregation reduces each partition to O(k) state before the shuffle —
  * the collect_list formulation ships EVERY row of every group across the
  * wire and materializes whole groups in memory. At 100 TB that is the
  * difference between shuffling k·groups rows and shuffling the table.
  * (Extension path (c): custom aggregation function, registered like any
  * Catalyst aggregate; rows with a null value or id are skipped.)
  */
case class TopKByValue(
    valueExpr: Expression,
    idExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[TopKAgg.Entry]] {

  require(k >= 1, "k must be positive")

  override def children: Seq[Expression] = Seq(valueExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.PriorityQueue[TopKAgg.Entry] =
    new java.util.PriorityQueue[TopKAgg.Entry](k, TopKAgg.WorstFirst)

  private def insert(buf: java.util.PriorityQueue[TopKAgg.Entry], v: Double, id: Long): Unit = {
    if (buf.size < k) buf.add(new TopKAgg.Entry(v, id))
    else {
      val worst = buf.peek()
      if (v > worst.value || (v == worst.value && id < worst.id)) {
        buf.poll()
        buf.add(new TopKAgg.Entry(v, id))
      }
    }
  }

  override def update(
      buf: java.util.PriorityQueue[TopKAgg.Entry],
      input: InternalRow): java.util.PriorityQueue[TopKAgg.Entry] = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null)
      insert(buf, v.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.PriorityQueue[TopKAgg.Entry],
      other: java.util.PriorityQueue[TopKAgg.Entry]): java.util.PriorityQueue[TopKAgg.Entry] = {
    val it = other.iterator()
    while (it.hasNext) { val e = it.next(); insert(buf, e.value, e.id) }
    buf
  }

  override def eval(buf: java.util.PriorityQueue[TopKAgg.Entry]): Any = {
    val arr = buf.toArray(new Array[TopKAgg.Entry](buf.size))
    java.util.Arrays.sort(arr, TopKAgg.BestFirst)
    new GenericArrayData(arr.map(_.id))
  }

  override def serialize(buf: java.util.PriorityQueue[TopKAgg.Entry]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + 16 * buf.size)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val e = it.next(); out.writeDouble(e.value); out.writeLong(e.id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[TopKAgg.Entry] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(new TopKAgg.Entry(in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByValue =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByValue =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByValue =
    copy(valueExpr = newChildren(0), idExpr = newChildren(1))
}

/** [[TopKByValue]] returning `(id, value)` STRUCTS instead of bare ids —
  * for the ranked outputs that must carry the score (the cosine kNN
  * family's (qid, vec_id, cos, rn) contract). Identical bounded-heap
  * semantics: the aggregate exists so the ranking can happen in O(k)
  * partial state BEFORE the only shuffle, where the `row_number` window
  * formulation it replaces sorts and shuffles the ENTIRE |Q|·occupancy
  * pair stream (the x100 probe measured q_emb_servecrawl's window tail
  * at 166 s; the heap form prices the same query at the scoring scan).
  */
case class TopKPairsByValue(
    valueExpr: Expression,
    idExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[TopKAgg.Entry]] {

  require(k >= 1, "k must be positive")

  override def children: Seq[Expression] = Seq(valueExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("value", DoubleType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): java.util.PriorityQueue[TopKAgg.Entry] =
    new java.util.PriorityQueue[TopKAgg.Entry](k, TopKAgg.WorstFirst)

  private def insert(buf: java.util.PriorityQueue[TopKAgg.Entry], v: Double, id: Long): Unit = {
    if (buf.size < k) buf.add(new TopKAgg.Entry(v, id))
    else {
      val worst = buf.peek()
      if (v > worst.value || (v == worst.value && id < worst.id)) {
        buf.poll()
        buf.add(new TopKAgg.Entry(v, id))
      }
    }
  }

  override def update(
      buf: java.util.PriorityQueue[TopKAgg.Entry],
      input: InternalRow): java.util.PriorityQueue[TopKAgg.Entry] = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null)
      insert(buf, v.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.PriorityQueue[TopKAgg.Entry],
      other: java.util.PriorityQueue[TopKAgg.Entry]): java.util.PriorityQueue[TopKAgg.Entry] = {
    val it = other.iterator()
    while (it.hasNext) { val e = it.next(); insert(buf, e.value, e.id) }
    buf
  }

  override def eval(buf: java.util.PriorityQueue[TopKAgg.Entry]): Any = {
    val arr = buf.toArray(new Array[TopKAgg.Entry](buf.size))
    java.util.Arrays.sort(arr, TopKAgg.BestFirst)
    new GenericArrayData(arr.map(e =>
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](e.id, e.value)): Any))
  }

  override def serialize(buf: java.util.PriorityQueue[TopKAgg.Entry]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + 16 * buf.size)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val e = it.next(); out.writeDouble(e.value); out.writeLong(e.id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[TopKAgg.Entry] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(new TopKAgg.Entry(in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsByValue =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsByValue =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKPairsByValue =
    copy(valueExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKAgg {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  final class Entry(val value: Double, val id: Long)

  /** Heap order: head = the WORST kept entry (smallest value; on ties the
    * larger id, since smaller ids win tie-breaks).
    *
    * `Double.compare` matches Spark/DuckDB's NaN-greatest ordering (a NaN
    * ranking key outranks every finite value in all three). One pedantic
    * divergence: it also orders -0.0 < +0.0 where SQL treats them equal
    * (id tie-break would apply) — unreachable from this engine's ranking
    * keys (decimal sums and quality arithmetic can't produce -0.0), noted
    * in case a future caller ranks by raw float data containing both.
    */
  val WorstFirst: java.util.Comparator[Entry] = new java.util.Comparator[Entry] {
    override def compare(a: Entry, b: Entry): Int = {
      val c = java.lang.Double.compare(a.value, b.value)
      if (c != 0) c else java.lang.Long.compare(b.id, a.id)
    }
  }

  /** Output order: value desc, id asc. */
  val BestFirst: java.util.Comparator[Entry] = new java.util.Comparator[Entry] {
    override def compare(a: Entry, b: Entry): Int = {
      val c = java.lang.Double.compare(b.value, a.value)
      if (c != 0) c else java.lang.Long.compare(a.id, b.id)
    }
  }

  /** Column API: ids of the k largest `value`s per group. */
  def top_k_ids(value: Column, id: Column, k: Int): Column =
    column(TopKByValue(expression(value), expression(id), k).toAggregateExpression())

  /** Column API: `(id, value)` structs of the k largest `value`s per
    * group, best first.
    */
  def top_k_pairs(value: Column, id: Column, k: Int): Column =
    column(TopKPairsByValue(expression(value), expression(id), k).toAggregateExpression())
}
