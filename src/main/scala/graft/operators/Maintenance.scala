package graft.operators

import org.apache.spark.sql.DataFrame

/** Write-side table maintenance for large parquet datasets.
  *
  * At 100 TB the write layout IS the query plan: thousands of tiny files
  * destroy scan scheduling, and unclustered files defeat min/max row-group
  * pruning. [[compactRangeSorted]] rewrites a dataset into bounded-size
  * files that are RANGE-clustered on a sort key — each output file covers
  * a disjoint key range, so a point/range filter on that key prunes whole
  * files via parquet footer statistics.
  */
object Maintenance {

  /** Rewrite `df` range-partitioned and sorted by `sortCols`, with at most
    * `maxRecordsPerFile` rows per file.
    *
    * repartitionByRange gives disjoint, ordered key ranges per partition
    * (one exchange with range sampling); sortWithinPartitions makes each
    * file internally ordered → parquet writes tight min/max stats.
    */
  def compactRangeSorted(df: DataFrame, path: String, numFiles: Int,
      maxRecordsPerFile: Long, sortCols: String*): Unit =
    df.repartitionByRange(numFiles, sortCols.map(df.col): _*)
      .sortWithinPartitions(sortCols.map(df.col): _*)
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
}
