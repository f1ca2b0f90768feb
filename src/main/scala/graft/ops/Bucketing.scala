package graft.ops

import org.apache.spark.sql.DataFrame

/** Bucketed-table helpers for co-located joins.
  *
  * Two tables bucketed (and sorted) on their join key with the same
  * bucket count join with NO shuffle on either side — the sort-merge
  * join reads co-located buckets directly. At 100 TB this is the
  * difference between re-shuffling the fact table on every join and
  * paying the partitioning cost once at write time (the reference's
  * FK-chain joins, run daily, are exactly this access pattern).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table in the session
    * catalog (in-memory catalog supports bucketing; no Hive needed). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    // an in-memory catalog forgets tables across sessions but the
    // managed location survives — drop both before rewriting
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(loc, true)
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on `key` — shuffle-free when both
    * were written with the same bucket count on the key. */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
      left: String, right: String, key: String,
      joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}
