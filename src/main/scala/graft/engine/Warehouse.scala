package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Batch write side of the engine: lay data out so future scans prune.
  *
  * At 100 TB the write-time layout IS the query plan: partition columns
  * become directory-level pruning (a date filter skips whole days on
  * disk), and sorting within partitions gives parquet min/max row-group
  * skipping on the sort keys.
  */
object Warehouse {
  /** Write `df` partitioned by `partitionCols` (directory pruning) and
    * sorted within files by `sortCols` (row-group min/max skipping). */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String], sortCols: Seq[String]): Unit = {
    val sorted =
      if (sortCols.nonEmpty)
        df.repartition(partitionCols.map(col): _*)
          .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      else df
    sorted.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Derived day partition column from an epoch-ms column (the standard
    * event-warehouse layout: dt=YYYY-MM-DD directories). */
  def withDayPartition(df: DataFrame, msCol: String): DataFrame =
    df.withColumn("dt", date_format(timestamp_millis(col(msCol)), "yyyy-MM-dd"))

  /** Read back a warehouse path (partition columns come back as data). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Compact a partitioned warehouse path in place: coalesce each
    * partition's small files into ~`targetRows`-row files, preserving the
    * within-file sort (so row-group min/max skipping survives).
    *
    * Streaming ingestion (FileEventSource / foreachBatch sinks) writes
    * one file per trigger per partition — at 100 TB that's millions of
    * KB-sized files whose open/footer overhead dominates scans ("small
    * file problem"). Compaction is the standing maintenance job every
    * real warehouse runs; here it is one deterministic Spark pass:
    * repartition each day to ceil(rows/targetRows) files via a
    * RANGE partitioner on the sort keys (contiguous key ranges per file
    * — unlike round-robin, the sort order carries across files), rewrite
    * to a temp dir, then swap. The swap is the same
    * write-temp/rename-commit pattern as NearDupStage's exactly-once
    * epoch dirs. */
  def compact(spark: SparkSession, path: String, partitionCols: Seq[String],
              sortCols: Seq[String], targetRows: Long = 1000000L): Unit = {
    val tmp = path + ".compact-tmp"
    val df = spark.read.parquet(path)
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / targetRows).toInt)
    val ranged =
      if (sortCols.nonEmpty)
        df.repartitionByRange(files, (partitionCols ++ sortCols).map(col): _*)
          .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      else df.repartition(files)
    ranged.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(tmp)
    // commit: atomic-enough swap (single-FS rename, as the streaming sinks)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(path + ".compact-old")
    fs.rename(dst, bak)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
    fs.delete(bak, true)
  }

  /** Write `df` as a BUCKETED managed table: rows are hash-distributed
    * into `nBuckets` files by `bucketCol` at WRITE time, so every later
    * join/aggregation on that key reads co-located data and plans with
    * ZERO shuffle (no Exchange in the physical plan — spec-asserted).
    *
    * This is the warehouse answer to the biggest fact-fact cost at
    * 100 TB: a recurring lineitem ⋈ orders on orderkey shuffles tens of
    * TB per run, or ZERO if both tables are bucketed on the key with the
    * same bucket count. Bucket count rule of thumb: total size /
    * bucket-file target (~128-512 MB), rounded to a power of two so
    * half/double-bucket tables still align. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(nBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
