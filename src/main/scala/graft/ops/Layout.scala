package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data layout for the 100 TB parquet lake.
  *
  * The reference writes one parquet object per (year, month)
  * (`gluejob.py:173-205`) — fine at pandas scale, fatal at cluster
  * scale: a single file per partition serializes both the write and
  * every later scan. This module is the scale path:
  *
  *  - '''hive partitioning''' on low-cardinality derived keys → scans
  *    with a partition predicate never open non-matching directories
  *    (partition pruning happens in the file index, before any I/O);
  *  - '''range clustering''' (repartitionByRange + sortWithinPartitions)
  *    on the query-time filter column → parquet row-group min/max
  *    statistics become tight and disjoint, so pushed-down predicates
  *    skip row groups instead of scanning them;
  *  - '''compaction''' of streaming/incremental small files into
  *    ~target-sized files — 100k × 1 MB files is a driver-side
  *    file-listing DoS and a task-scheduling DoS at once.
  */
object Layout {

  /** Write hive-partitioned, range-clustered parquet: partition dirs on
    * `partitionCols`, files within each partition range-distributed and
    * sorted on `sortCols`. Task count = filesPerPartition × the number
    * of distinct partition VALUES (approx-counted in one cheap agg pass
    * when `partitionValues` isn't supplied), so each hive partition dir
    * lands ~filesPerPartition files regardless of how many partition
    * values exist (AQE cannot merge the final sorted write). Callers
    * that know the value count (e.g. months in a year) should pass it
    * and skip the sizing pass. */
  def writeClustered(df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String],
      filesPerPartition: Int = 4,
      partitionValues: Option[Long] = None): Unit = {
    val nVals = partitionValues.getOrElse {
      if (partitionCols.isEmpty) 1L
      else df.select(approx_count_distinct(
          struct(partitionCols.map(col): _*)).as("n"))
        .collect()(0).getLong(0)
    }
    val nTasks = (math.max(filesPerPartition, 1).toLong
      * math.max(nVals, 1L)).min(Int.MaxValue.toLong).toInt
    val dist = (partitionCols ++ sortCols).map(col)
    df.repartitionByRange(nTasks, dist: _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Write Z-ORDER clustered parquet: rows sorted by the Morton
    * interleave of two pre-normalized long columns, so row-group
    * min/max stats stay tight on BOTH columns and predicates on either
    * skip row groups — a plain sort only skips on its leading column.
    * (`graft.functions.ZOrder64`; inputs should be ranks/buckets of
    * comparable magnitude.) */
  def writeZOrdered(df: DataFrame, path: String,
      colA: String, colB: String, numFiles: Int = 8): Unit = {
    val z = graft.functions.ZOrder64(col(colA), col(colB))
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Compact a directory of small parquet files into ~`targetBytes`
    * files at `outPath`. Coalesce (not repartition): merging files needs
    * no shuffle, only fewer write tasks. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long = 128L << 20): Unit = {
    val fs = new org.apache.hadoop.fs.Path(inPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(inPath)).getLength
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath).coalesce(n)
      .write.mode("overwrite").parquet(outPath)
  }

  /** Count the data files under a path (test/ops observability). */
  def dataFileCount(spark: SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var n = 0
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) n += 1
    }
    n
  }
}

/** Byte-compatible writer for the reference's S3 layout
  * (gluejob.py:187):
  * `{base}/{table}/company={company}/{table}_year={y}/{table}_month={m}/{table}.parquet`
  * — table-prefixed partition directory names, unpadded int values, ONE
  * snappy parquet object per partition named `{table}.parquet`.
  *
  * This exists ONLY for drop-in path compatibility with consumers that
  * glob the reference's paths; [[Upsert.upsertPartitioned]]'s idiomatic
  * `partitionBy` layout (multi-file partitions, standard column names)
  * is the default and the right shape at scale — a single file per
  * partition serializes both the write and every later scan, which is
  * exactly the reference bottleneck SURVEY §7.4(3) opted out of.
  *
  * Mechanics: the prefixed dir names fall out of naming the partition
  * COLUMNS `{table}_year`/`{table}_month` (hive encoding does the
  * rest); one `repartition` task per partition yields exactly one file,
  * renamed to `{table}.parquet` in a post-write FS pass that also drops
  * `_SUCCESS`/checksum artifacts the reference layout doesn't have. */
object ReferenceLayout {

  /** Write `df` (carrying int `year`/`month` columns, as produced by
    * Normalize's partition derivation) in the reference layout. */
  def write(df: DataFrame, basePath: String, table: String,
      company: String = "Locaweb"): Unit = {
    val yearCol = s"${table}_year"; val monthCol = s"${table}_month"
    val parts = Seq("company", yearCol, monthCol)
    val tablePath = s"$basePath/$table"
    df.withColumn("company", lit(company))
      .withColumnRenamed("year", yearCol)
      .withColumnRenamed("month", monthCol)
      .repartition(parts.map(col): _*)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", "snappy")
      .partitionBy(parts: _*)
      .parquet(tablePath)
    renameToSingleObject(df.sparkSession, tablePath, table)
  }

  /** Read the reference layout back with the engine's standard column
    * names (`year`/`month`) — partition pruning on them still reaches
    * the file index because they remain partition columns. */
  def read(spark: SparkSession, basePath: String, table: String): DataFrame =
    spark.read.parquet(s"$basePath/$table")
      .withColumnRenamed(s"${table}_year", "year")
      .withColumnRenamed(s"${table}_month", "month")

  private def renameToSingleObject(spark: SparkSession, tablePath: String,
      table: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(root, "_SUCCESS")
    if (fs.exists(marker)) fs.delete(marker, false)
    // snapshot the listing BEFORE renaming — mutating under a live
    // RemoteIterator is undefined on some filesystems
    val it = fs.listFiles(root, true)
    val parts = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.Path]
    while (it.hasNext) {
      val f = it.next().getPath
      if (f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        parts += f
    }
    parts.foreach { f =>
      val target = new org.apache.hadoop.fs.Path(f.getParent, s"$table.parquet")
      require(!fs.exists(target),
        s"multiple files in ${f.getParent} — partition not single-file")
      fs.rename(f, target)
    }
  }
}
