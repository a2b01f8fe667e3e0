package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match left rows whose `value` falls in a right
  * interval [lo, hi).
  *
  * The naive plan for `l JOIN r ON l.v >= r.lo AND l.v < r.hi` is a
  * broadcast-nested-loop (O(|L|·|R|)). This operator turns it into an
  * EQUI-join by bucketing: intervals are exploded to the fixed-width
  * buckets they cover, points map to their bucket, the join key is the
  * bucket id, and the residual range predicate filters the few candidates
  * sharing a bucket. Work becomes O(|L| + |R|·intervalWidth/bucket) with a
  * shuffle on the bucket id — the standard trick interval-join engines use
  * and the shape that survives scale.
  */
object RangeJoin {

  /** @param left      point side (column `valueCol`)
    * @param right     interval side (columns `loCol`, `hiCol`; hi exclusive)
    * @param bucketWidth bucket size in value units — pick ≈ median interval
    *                    width so each interval covers O(1) buckets
    */
  def bucketedRangeJoin(left: DataFrame, valueCol: String,
      right: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    val lb = left.withColumn("__bkt", floor(col(valueCol) / bucketWidth).cast("long"))
    // Explode through floor(hi/width) inclusive: when hi sits exactly on a
    // bucket edge this adds one spurious candidate bucket, which the
    // residual v < hi filter discards — an epsilon-subtraction here would
    // instead DROP matches whenever hi lands within the epsilon above an
    // edge. Degenerate intervals (hi <= lo) are filtered out rather than
    // letting sequence() descend.
    val rb = right
      .filter(col(loCol) < col(hiCol))
      .withColumn("__bkt",
        explode(sequence(
          floor(col(loCol) / bucketWidth).cast("long"),
          floor(col(hiCol) / bucketWidth).cast("long"))))
    lb.join(rb, Seq("__bkt"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bkt")
  }
}
