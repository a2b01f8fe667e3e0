package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * When one join key carries a disproportionate share of rows (the classic
  * hot-key problem), a plain shuffle join puts the whole hot key in ONE
  * task. Salting splits it `buckets` ways: the big side gets a random salt
  * in [0, buckets); the small side is replicated `buckets` times with every
  * salt value; the join key becomes (key, salt). Same results, hot key
  * spread over `buckets` tasks.
  *
  * AQE's skew-join handling (enabled in Engine.tune) solves the same
  * problem adaptively for sort-merge joins; this explicit operator is for
  * when the skew is known ahead of time, the join is hash-based, or the
  * runtime can't split (e.g. aggregation-after-join pipelines that want a
  * stable partitioning).
  */
object SkewJoin {

  /** Inner equi-join `left ⋈ right` on `key`, salted `buckets` ways.
    * `right` is the smaller side (it gets replicated ×buckets).
    */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
      buckets: Int = 8): DataFrame = {
    // deterministic pseudo-random salt from an unrelated hash of the whole
    // left row would be ideal; a hash of a monotonic id is enough to spread
    val l = left.withColumn("__salt", pmod(hash(monotonically_increasing_id()), lit(buckets)))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    l.join(r, l(key) === r(key) && l("__salt") === r("__salt"))
      .drop("__salt")
      .drop(r(key))
  }
}
