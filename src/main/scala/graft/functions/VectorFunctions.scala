package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over ArrayType(Float/Double) embedding columns.
  *
  * All folds are strictly sequential (left-to-right) so results are
  * bit-reproducible and match the DuckDB oracle's list_reduce, which
  * folds in the same order. Plain `sum()` over exploded elements would
  * NOT be — aggregation order varies with partitioning.
  */
object VectorFunctions {

  /** Cast array<float> → array<double> (exact). */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Sequential left fold sum of an array<double>. */
  def seqSum(v: Column): Column =
    aggregate(v, lit(0.0d), (acc, x) => acc + x)

  /** Dot product, sequential accumulation — the native codegen'd
    * expression (see expressions/SeqDot); [[dotHof]] keeps the
    * built-ins-only formulation as the cross-check.
    */
  def dot(a: Column, b: Column): Column = graft.expressions.SeqDot.seq_dot(a, b)

  /** HOF formulation of [[dot]] (interpreted lambdas). */
  def dotHof(a: Column, b: Column): Column =
    seqSum(zip_with(a, b, (x, y) => x * y))

  /** L2 norm. */
  def l2norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity from precomputed norms (precompute norms BEFORE a
    * pairwise join — O(n) instead of O(n²) norm work).
    *
    * Zero-norm guarded: cosine is undefined for the zero vector and ANSI
    * mode (Spark 4 default) turns the division into a query-aborting
    * DIVIDE_BY_ZERO — one junk vector anywhere in 100 TB would kill the
    * whole stage. Zero-norm pairs yield null (ranked last under the
    * (cos DESC, id) windows). The corpus tables contain no zero vectors,
    * so oracle rows are unchanged; DegenerateInputSpec pins the
    * tolerance.
    */
  def cosineWithNorms(dotAB: Column, normA: Column, normB: Column): Column =
    when(normA * normB > 0, dotAB / (normA * normB))

  /** Squared L2 distance — the native codegen'd expression (see
    * expressions/SeqL2Sq): one generated loop per pair, left-to-right
    * accumulation, bit-identical to [[l2sqHof]] and to the DuckDB
    * oracle's list_reduce. This is the k-means/IVF family's inner loop
    * (every vector × k centroids per assignment pass), where the
    * interpreted HOF was the hot-path CodegenFallback.
    */
  def l2sq(a: Column, b: Column): Column = graft.expressions.SeqL2Sq.seq_l2sq(a, b)

  /** HOF formulation of [[l2sq]] (interpreted lambdas) — the built-ins
    * cross-check, same per-element `(x−y)·(x−y)` and fold order.
    */
  def l2sqHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, x) => acc + x)

  /** Fixed-point quantization for order-independent exact sums: float →
    * round(x·2^24) as long. Sums of these are integer-exact and therefore
    * independent of aggregation order — use for centroids / elementwise
    * means where the sum crosses partitions.
    *
    * SATURATING at ±2^53 (the exact-integer double range): a junk vector
    * with a 1e30 coordinate would otherwise turn the long cast into a
    * query-aborting ANSI CAST_OVERFLOW mid-aggregation. Sane embeddings
    * (‖x‖ ≲ 10³) sit 5+ orders of magnitude under the clamp, so oracle
    * math is unchanged; corrupt rows contribute a saturated extreme
    * instead of killing the stage (DegenerateInputSpec pins it).
    */
  val QuantScale = 16777216L // 2^24
  private val QuantClamp = 9007199254740992.0d // 2^53
  def quantize(x: Column): Column =
    least(greatest(round(x * lit(QuantScale.toDouble)), lit(-QuantClamp)),
      lit(QuantClamp)).cast("long")
  def dequantize(sum: Column, n: Column): Column =
    sum.cast("double") / (n.cast("double") * lit(QuantScale.toDouble))
}
