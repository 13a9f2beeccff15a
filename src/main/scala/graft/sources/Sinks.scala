package graft.sources

import org.apache.spark.sql.DataFrame

/** Write-side layouts. The reference's only sink is a BigQuery append
  * (/root/reference/scripts/process_sales.py:66-69); the engine keeps that
  * append contract and adds the two layouts that matter at 100 TB:
  *
  *  - partitioned parquet: one directory per partition value → partition
  *    pruning turns predicates on the partition column into directory
  *    listing, no data read at all (PartitionFilters in the scan);
  *  - bucketed tables: rows pre-hashed into N buckets on the join/agg key
  *    at write time → joins and aggs on that key between co-bucketed
  *    tables skip the shuffle entirely (asserted in BucketingSpec). This
  *    is the batch answer to "don't shuffle 100 TB twice".
  */
object Sinks {

  /** The reference's append sink, offline form. */
  def appendParquet(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** Hive-style partitioned layout: `path/col=value/part-*.parquet`. */
  def partitionedParquet(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Range-partitioned, internally-sorted parquet: every output file owns a
    * disjoint range of `sortCol`, so parquet row-group min/max statistics
    * let a selective scan skip whole files (data skipping — the scan-side
    * complement to partition pruning when the column is too fine-grained
    * to partition by, e.g. timestamps).
    */
  def sortedParquet(df: DataFrame, path: String, sortCol: String,
                    files: Int = 8): Unit =
    df.repartitionByRange(files, df.col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(path)

  /** Bucketed + sorted managed table (bucketBy requires the table catalog).
    * Joining two tables bucketed identically on the join key is
    * shuffle-free; sortBy additionally enables sort-merge without a sort.
    */
  def bucketedTable(df: DataFrame, table: String, keyCol: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)
}
