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
    * epoch dirs.
    *
    * Concurrent-writer safety: the rewrite reads an explicit SNAPSHOT of
    * the data files listed at entry, and any file committed under `path`
    * AFTER the snapshot is carried across into the compacted dir before
    * the swap — a streaming sink landing files mid-compaction loses
    * nothing. Files that land between the carry-across listing and the
    * dst→bak rename travel with the backup and are recovered by a final
    * sweep of the backup before it is deleted. The only window needing
    * exclusivity is the final three-rename swap itself (sub-second,
    * metadata-only); callers must quiesce writers for the swap, not for
    * the rewrite. The `.compact-old`
    * backup is deleted only AFTER the new dir is verified in place; a
    * crash mid-swap leaves either the original dir or the backup intact
    * for manual recovery — data is never in zero places. */
  def compact(spark: SparkSession, path: String, partitionCols: Seq[String],
              sortCols: Seq[String], targetRows: Long = 1000000L,
              onBeforeSwap: () => Unit = () => ()): Unit = {
    import org.apache.hadoop.fs.Path
    val dst = new Path(path)
    // the path's OWN filesystem — FileSystem.get(conf) resolves the
    // DEFAULT scheme and throws 'Wrong FS' for e.g. s3a:// on an
    // HDFS-default cluster
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + ".compact-tmp")
    val bak = new Path(path + ".compact-old")

    // relative data-file listing (skips _SUCCESS and hidden/in-progress
    // files). Every path COMPONENT is checked, not just the leaf: Spark
    // batch writers stage in-flight output under _temporary/ and
    // .spark-staging-*/ directories whose leaf names are plain
    // part-*.parquet — leaf-only filtering would snapshot (and carry
    // away) a concurrent writer's uncommitted files.
    def dataFiles(root: Path): Map[String, Path] = {
      val prefix = fs.makeQualified(root).toString + "/"
      val it = fs.listFiles(root, true)
      val b = Map.newBuilder[String, Path]
      while (it.hasNext) {
        val p = it.next().getPath
        val rel = fs.makeQualified(p).toString.stripPrefix(prefix)
        if (rel.split('/').forall(s => !s.startsWith("_") && !s.startsWith(".")))
          b += rel -> p
      }
      b.result()
    }

    val snapshot = dataFiles(dst)
    if (snapshot.isEmpty) return
    // rewrite exactly the snapshot (basePath keeps partition-dir columns)
    val df = spark.read.option("basePath", path)
      .parquet(snapshot.keys.toSeq.sorted.map(path + "/" + _): _*)
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / targetRows).toInt)
    val ranged =
      if (sortCols.nonEmpty)
        df.repartitionByRange(files, (partitionCols ++ sortCols).map(col): _*)
          .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      else df.repartition(files)
    ranged.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(tmp.toString)

    onBeforeSwap() // test seam: lets a spec land a concurrent-writer file here

    // carry across files a concurrent writer committed since the snapshot
    val carried = scala.collection.mutable.Set.empty[String]
    dataFiles(dst).foreach { case (rel, p) =>
      if (!snapshot.contains(rel)) {
        val to = new Path(tmp, rel)
        fs.mkdirs(to.getParent)
        if (!fs.rename(p, to))
          throw new java.io.IOException(s"compact: failed to carry $p into $tmp")
        carried += rel
      }
    }

    // commit: atomic-enough swap (single-FS renames, as the streaming sinks)
    if (!fs.rename(dst, bak))
      throw new java.io.IOException(s"compact: failed to move $dst aside")
    if (!fs.rename(tmp, dst)) {
      fs.rename(bak, dst) // roll back so the warehouse path never vanishes
      throw new java.io.IOException(s"compact: failed to commit $tmp; restored original")
    }
    // delete the backup only once the new dir is verified in place — and
    // first sweep it for LATE ARRIVALS: a file committed into dst between
    // the carry-across listing and the dst→bak rename traveled with the
    // backup; move any data file that is neither in the snapshot nor
    // already carried into the new dir, so no committed row is deleted.
    if (fs.exists(dst) && fs.listStatus(dst).nonEmpty) {
      dataFiles(bak).foreach { case (rel, p) =>
        if (!snapshot.contains(rel) && !carried.contains(rel)) {
          val to = new Path(dst, rel)
          fs.mkdirs(to.getParent)
          if (!fs.rename(p, to))
            throw new java.io.IOException(s"compact: failed to recover late file $p from $bak")
        }
      }
      fs.delete(bak, true)
    }
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
