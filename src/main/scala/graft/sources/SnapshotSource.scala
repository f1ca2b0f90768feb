package graft.sources

import scala.jdk.CollectionConverters._

import graft.ops.SnapshotTable
import graft.ops.SnapshotTable.Snap
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SparkSession, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{BaseRelation, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 READ surface over the snapshot table — the rung that
  * makes the table consumable the way its Delta/Iceberg models are:
  * {{{
  *   spark.read.format("graft.sources.SnapshotSource")
  *     .option("path", dir)          // required
  *     .option("versionAsOf", 3)     // optional time travel
  *     .option("tag", "train-v1")    // optional, by named ref
  *     .load()
  * }}}
  * instead of calling [[SnapshotTable.read]] by name. The scan is a
  * REAL pushdown citizen (the [[DocStore]] pattern over the
  * manifest): range/point predicates on any recorded stats column
  * route into the manifest's three-stage pruning — entries by
  * per-column bounds, files by footer bounds, row groups by parquet's
  * own stats — via [[SnapshotTable.readSnapPruned]], and column
  * pruning reaches the reader. Pushed filters are ADVISORY (pruning
  * is file-granular): every filter returns as unhandled so Spark
  * re-applies the exact predicate post-scan — the same contract the
  * parquet file source keeps, visible in the scan's `PushedFilters`.
  *
  * Execution delegates through [[V1Scan]] to the engine's own read
  * path (manifest resolve → pruned parquet read → deletion-vector
  * anti-joins), so the DSv2 surface and the Scala API can never
  * disagree about what a version contains — one reader, two doors.
  * Writes stay with the Scala API (merge/mergeCdc are multi-job
  * protocols with their own commit discipline, not a V2 append). */
class SnapshotSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap)
      : StructType = {
    val (_, snap) = SnapshotSource.resolveFrom(options)
    StructType.fromDDL(snap.schemaDdl)
  }

  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val (dir, snap) = SnapshotSource.resolveFrom(
      new CaseInsensitiveStringMap(properties))
    new SnapshotSourceTable(dir, snap)
  }
}

object SnapshotSource {

  /** Resolve the pinned snapshot the options name — head by default,
    * `versionAsOf` for time travel, `tag` for named refs, `branch`
    * for a writable branch's staged head (all mutually exclusive,
    * like Delta's versionAsOf/timestampAsOf). */
  private[sources] def resolveFrom(opts: CaseInsensitiveStringMap)
      : (String, Snap) = {
    val dir = Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "snapshot source requires option path"))
    val ver = Option(opts.get("versionasof")).map { v =>
      v.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"versionAsOf must be a version number, got '$v'"))
    }
    val tag = Option(opts.get("tag"))
    val branch = Option(opts.get("branch"))
    require(Seq(ver, tag, branch).count(_.isDefined) <= 1,
      "versionAsOf, tag, and branch are mutually exclusive")
    val spark = SparkSession.active
    val snap = (tag, branch) match {
      case (Some(t), _) => SnapshotTable.resolveTag(spark, dir, t)
      case (_, Some(b)) => SnapshotTable.resolveBranch(spark, dir, b)
      case _ => SnapshotTable.resolve(spark, dir, ver)
    }
    (dir, snap)
  }

  /** Spec observability: the concrete parquet paths the LAST scan of
    * this JVM planned (post entry- and file-pruning) and the schema
    * it read — how the spec pins "the DSv2 path really pruned" and
    * "column pruning reached the reader" without parsing explain
    * output. */
  @volatile private[graft] var lastPlannedPaths: Seq[String] = Nil
  @volatile private[graft] var lastReadSchema: StructType = new StructType()
}

private[sources] class SnapshotSourceTable(dir: String, snap: Snap)
    extends Table with SupportsRead {

  override def name(): String = s"graft-snapshot($dir@v${snap.ver})"
  override def schema(): StructType = StructType.fromDDL(snap.schemaDdl)
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new SnapshotScanBuilder(dir, snap)
}

/** Pushdown state: each accepted filter contributes one (column, lo,
  * hi) bound routed into the manifest pruning — several filters on
  * one column simply prune more (the chained [[SnapshotTable
  * .pruneByKey]] intersects). Strict comparisons relax to inclusive
  * bounds (sound: pruning is conservative, the exact predicate is
  * re-applied by Spark). Only columns with RECORDED stats accept —
  * anything else returns unhandled untouched. */
private[sources] class SnapshotScanBuilder(dir: String, snap: Snap)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private val full = StructType.fromDDL(snap.schemaDdl)
  private var required = full
  private var accepted = Array.empty[Filter]
  private val bounds =
    scala.collection.mutable.ArrayBuffer
      .empty[(String, Option[Any], Option[Any])]

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val statsCols = snap.statsKeys.toSet
    accepted = filters.filter {
      case EqualTo(c, v) if statsCols(c) && v != null =>
        bounds += ((c, Some(v), Some(v))); true
      case GreaterThan(c, v) if statsCols(c) && v != null =>
        bounds += ((c, Some(v), None)); true
      case GreaterThanOrEqual(c, v) if statsCols(c) && v != null =>
        bounds += ((c, Some(v), None)); true
      case LessThan(c, v) if statsCols(c) && v != null =>
        bounds += ((c, None, Some(v))); true
      case LessThanOrEqual(c, v) if statsCols(c) && v != null =>
        bounds += ((c, None, Some(v))); true
      case _ => false
    }
    // ALL filters return as unhandled: the pruning is file-granular
    // (a superset survives), so Spark must keep its exact post-scan
    // copies — the parquet source's own advisory-pushdown contract
    filters
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    // V2ScanRelationPushDown may hand an empty schema for a bare
    // count(*); the V1 relation must still produce rows, so keep at
    // least one (smallest-footprint) column
    required =
      if (requiredSchema.fields.nonEmpty) requiredSchema
      else StructType(full.fields.take(1))

  override def build(): Scan =
    new SnapshotV1Scan(dir, snap, required, bounds.toSeq, accepted)
}

private[sources] class SnapshotV1Scan(dir: String, snap: Snap,
    required: StructType,
    bounds: Seq[(String, Option[Any], Option[Any])],
    pushed: Array[Filter]) extends V1Scan {

  override def readSchema(): StructType = required

  override def description(): String =
    s"graft-snapshot $dir v${snap.ver} " +
      s"PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new SnapshotRelation(context, dir, snap, required, bounds)
      .asInstanceOf[T]
}

/** The V1 bridge relation: builds the engine's own pruned DataFrame
  * (manifest three-stage pruning + dv anti-joins + column projection)
  * and hands Spark its RDD — the executed plan is the same scan the
  * Scala API runs, just reached through `spark.read.format`. */
private[sources] class SnapshotRelation(ctx: SQLContext, dir: String,
    snap: Snap, required: StructType,
    bounds: Seq[(String, Option[Any], Option[Any])])
    extends BaseRelation with TableScan {

  override def sqlContext: SQLContext = ctx
  override def schema: StructType = required

  override def buildScan(): RDD[Row] = {
    val spark = ctx.sparkSession
    // observability (spec): what the pruning actually planned
    val surviving = bounds.foldLeft(snap) { case (s, (k, lo, hi)) =>
      SnapshotTable.pruneByKey(s, k, lo, hi)
    }
    SnapshotSource.lastPlannedPaths =
      SnapshotTable.prunedFilePaths(dir, surviving, bounds)
    SnapshotSource.lastReadSchema = required
    val df = SnapshotTable.readSnapPruned(spark, dir, snap, bounds)
    df.select(required.fieldNames.toSeq.map(col): _*).rdd
  }
}
