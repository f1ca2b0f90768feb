package graft.sources

import graft.schema.{SourceDb, TableSpec}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Initial-load CSV source (reference: gluejob.py:226-242).
  *
  * Per-table separator, header row, projection to the declared schema
  * (`usecols`), and a missing-file guard that yields an empty frame with
  * the declared schema (the reference logs + skips, gluejob.py:238-240).
  * Schema-on-read is all-string, so the CSV arrives already in bronze
  * form; Catalyst prunes columns at the scan.
  */
object CsvSource {

  def read(spark: SparkSession, spec: TableSpec, path: String): DataFrame =
    if (!exists(spark, path)) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], spec.schema)
    else
      spark.read
        .option("sep", spec.csvSep)
        .option("header", "true")
        .schema(spec.schema) // projection: extra file columns are dropped
        .csv(path)
        .select(spec.columns.map(col): _*)

  private[sources] def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}

/** Incremental JDBC source (reference: gluejob.py:244-280, 521-600).
  *
  * The reference writes the watermark predicate and FK semi-join chain
  * into literal SQL executed by the source DB. Idiomatically we read the
  * table relation and apply `.filter(...)`; Catalyst's JDBC pushdown
  * moves the watermark predicate into the remote query, and the
  * semi-join chain runs distributed in Spark (graft.ops.SemiJoins). Both
  * dialects of the reference are carried (Postgres + SQL Server,
  * gluejob.py:244-262).
  *
  * `partitionColumn` parallel extract is exposed because a single-slice
  * JDBC read is the 100 TB anti-pattern: numPartitions concurrent range
  * queries keep every executor extracting.
  */
object JdbcSource {

  final case class ConnInfo(host: String, port: Int, db: String,
      user: String, password: String)

  def url(source: SourceDb, c: ConnInfo): String = source match {
    case graft.schema.Postgres =>
      s"${source.jdbcScheme}://${c.host}:${c.port}/${c.db}"
    case graft.schema.SqlServer =>
      s"${source.jdbcScheme}://${c.host}:${c.port};databaseName=${c.db}"
  }

  def read(spark: SparkSession, spec: TableSpec, conn: ConnInfo,
      watermark: String,
      numPartitions: Int = 1): DataFrame =
    readFromUrl(spark, spec, url(spec.source, conn), conn.user,
      conn.password, watermark, numPartitions)

  /** Dialect-agnostic variant (any JDBC URL — also used by tests
    * against embedded Derby). The watermark `>=` predicate is applied
    * as a Catalyst filter and pushed into the remote query.
    *
    * `upperBound` (parallel extract only) defaults to driver-now; it is
    * a range-split hint, NOT a filter — rows outside [lower, upper) still
    * arrive via the unbounded first/last stride queries, so a lagging
    * driver clock cannot drop data. Spark parses timestamp bounds with
    * `Timestamp.valueOf` (`yyyy-MM-dd HH:mm:ss[.f]`), so both bounds are
    * rendered with [[graft.state.WatermarkStore.Fmt]] — ISO-8601's 'T'
    * separator would throw at load. */
  def readFromUrl(spark: SparkSession, spec: TableSpec, jdbcUrl: String,
      user: String, password: String, watermark: String,
      numPartitions: Int = 1,
      upperBound: Option[String] = None): DataFrame = {
    val reader = spark.read.format("jdbc")
      .option("url", jdbcUrl)
      .option("dbtable", spec.name)
      .option("user", user)
      .option("password", password)
    val base =
      (if (numPartitions > 1)
        // range-partitioned parallel extract on the watermark column
        reader.option("partitionColumn", spec.updatedCol)
          .option("numPartitions", numPartitions.toString)
          .option("lowerBound", watermark)
          .option("upperBound", upperBound.getOrElse(
            java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)
              .format(graft.state.WatermarkStore.Fmt)))
       else reader).load()
    // `>=` (not `>`) re-reads the boundary row set; dedup absorbs it
    // (gluejob.py:526 et al.) — pushed to the remote DB by Catalyst.
    base.filter(col(spec.updatedCol) >= lit(watermark))
      .select(spec.columns.map(col): _*)
  }

  /** Source-DB server-time probe captured at job start as the next
    * watermark (immune to driver clock skew; gluejob.py:282-304). The
    * reference's SQL Server probe is stubbed to '' — a latent bug we do
    * NOT reproduce: the probe is mandatory per dialect here. */
  def probeTimeSql(source: SourceDb): String = source.timeProbeSql

  def probeTime(spark: SparkSession, source: SourceDb, conn: ConnInfo): String = {
    val df = spark.read.format("jdbc")
      .option("url", url(source, conn))
      .option("query", source.timeProbeSql)
      .option("user", conn.user)
      .option("password", conn.password)
      .load()
    val ts = df.collect()(0).getTimestamp(0).toLocalDateTime
    ts.format(graft.state.WatermarkStore.Fmt)
  }
}

/** JSON-lines source — the third bronze-input format alongside CSV and
  * JDBC. Change feeds and event exports commonly land as JSONL; at
  * scale the non-negotiables are an EXPLICIT schema (schema inference
  * reads the whole dataset twice before the job starts) and a policy
  * for malformed lines that quarantines instead of killing the batch.
  */
object JsonSource {

  /** Read JSONL with the declared schema. PERMISSIVE mode parses what
    * it can; lines that don't parse land whole in `_quarantine` (null
    * for good rows), so the caller can split good/bad and dead-letter
    * the bad — the same at-least-once + idempotent-merge posture as the
    * reference's ingest (bad rows re-arrive next run, dedup absorbs). */
  def read(spark: SparkSession, schema: org.apache.spark.sql.types.StructType,
      path: String): DataFrame =
    spark.read
      .schema(schema.add("_quarantine", org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_quarantine")
      .json(path)

  /** A [[split]] result: good rows, quarantined raw lines, and a
    * `release()` that unpersists the shared parsed cache once both
    * halves are consumed — without it every split pins its whole parsed
    * batch in executor storage for the session lifetime. */
  final case class Split(good: DataFrame, quarantined: DataFrame,
      release: () => Unit)

  /** Split a [[read]] result into good rows (without the quarantine
    * column) and quarantined raw lines. The batch is cached first: Spark
    * refuses to answer queries that prune down to ONLY the corrupt-
    * record column straight off the files
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and both
    * halves re-reading+re-parsing the raw JSON would double the scan
    * anyway — one parse, two consumers. Call `release()` after both
    * halves are materialized (written / collected). */
  def split(df: DataFrame): Split = {
    val parsed = df.cache()
    Split(
      parsed.filter(col("_quarantine").isNull).drop("_quarantine"),
      parsed.filter(col("_quarantine").isNotNull).select(col("_quarantine")),
      () => { parsed.unpersist(); () })
  }
}

/** ORC source/sink — the second columnar format next to parquet.
  * Spark's native ORC reader has the same pushdown machinery as
  * parquet (predicate pushdown into stripe/row-group indexes, column
  * pruning, vectorized read), so interchange with ORC-based warehouses
  * (Hive, Trino) costs no plan quality. Snappy to match the
  * reference's parquet compression choice (gluejob.py:187). */
object OrcSource {

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def write(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").option("compression", "snappy")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .orc(path)
  }
}
