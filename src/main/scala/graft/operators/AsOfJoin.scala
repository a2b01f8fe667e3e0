package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the single latest right row with
  * `right.ts <= left.ts` on the same key (the time-series "last known
  * value" join; DuckDB/kdb call it ASOF JOIN, and DuckDB's native ASOF
  * JOIN is the oracle for this operator).
  *
  * Spark has no native as-of join, and the naive formulation
  * (`left JOIN right ON key AND r.ts <= l.ts` + row_number) explodes into
  * an O(n·m) range join per key. This implementation uses the
  * union-and-carry composition instead (preference order (a):
  * compose built-ins — no custom SparkPlan needed):
  *
  *   1. tag both sides, union on (key, ts) — one dataset;
  *   2. one window per key ordered by (ts, tag) — right rows sort before
  *      left rows at equal ts, making the match inclusive (>= semantics);
  *   3. `last(rightPayload, ignoreNulls)` carries the most recent right
  *      values forward; filter back to left rows.
  *
  * Cost: ONE shuffle on the key + a per-key sort — linear in |L|+|R|,
  * skew-safe under AQE, no range explosion. This is the shape that
  * survives 100 TB.
  */
object AsOfJoin {

  /** @param left       left (probe) side
    * @param right      right (reference) side
    * @param key        equi-join key column name (present on both sides)
    * @param leftTs     left event-time column name
    * @param rightTs    right event-time column name
    * @param rightVals  right columns to carry (renamed as-is onto the output)
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // The whole right payload rides in ONE struct: a right row's struct is
    // never null (even when its fields are), so `last(ignoreNulls)` can't
    // skip a matched-but-null value, and all payload columns always come
    // from the SAME right row (carrying columns independently could mix
    // rows whenever any value is null).
    val rStructType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c)))
    // NULL keys never equi-match in as-of semantics (DuckDB ASOF ON l.k =
    // r.k), but Window.partitionBy groups NULLs together — drop null-key
    // right rows so null-key left rows fall through with a null payload.
    // A NULL right timestamp never satisfies l.ts >= r.ts either, yet
    // would sort FIRST (asc_nulls_first) and get carried — drop those too.
    val rightNonNull = right.filter(col(key).isNotNull && col(rightTs).isNotNull)
    val r = rightNonNull.select(
      (col(key) +: col(rightTs).as("__ts") +: lit(0).as("__tag") +:
        struct(rightVals.map(col): _*).as("__r") +:
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    // tag=0 sorts right rows first at ties → inclusive (right.ts <= left.ts)
    val l = left.select(
      (col(key) +: col(leftTs).cast(right.schema(rightTs).dataType).as("__ts") +:
        lit(1).as("__tag") +: lit(null).cast(rStructType).as("__r") +:
        leftCols.filterNot(_ == key).map(col)): _*)
    // tertiary sort on the payload struct pins which right row wins a
    // (key, ts) tie — without it the carried row depends on partition
    // order (every other operator in this engine pins its tie-breaks)
    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__tag"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("__rc", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols.map(col) ++ rightVals.map(c => col(s"__rc.$c").as(c)): _*)
  }
}
