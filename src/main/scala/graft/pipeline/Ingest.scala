package graft.pipeline

import graft.ops.{Normalize, PartitionKeys, SnapshotTable, Upsert}
import graft.schema.{TableSpec, Tables}
import graft.sources.CsvSource
import graft.state.WatermarkStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Flow dispatch + per-table orchestration (reference: gluejob.py:141-171,
  * 306-327, 602-627; README.md:6-17).
  *
  * Run modes:
  *  - OnDemand  -> initial load from CSV (no watermark advance,
  *                 gluejob.py:163-171)
  *  - Scheduled -> incremental from source frames filtered by watermark
  *  - anything else -> no-op default_behavior (gluejob.py:141-142)
  *
  * JobMode selects `allTables` or a single table (gluejob.py:306-327);
  * unknown modes no-op. Watermarks commit once, after every selected
  * table succeeds (gluejob.py:621-623) — at-least-once, idempotent via
  * the upsert dedup.
  */
object Ingest {

  sealed trait Flow
  case object OnDemand extends Flow
  case object Scheduled extends Flow
  case object NoOp extends Flow

  /** Sink strategy for the per-table upsert. [[OverwriteSink]] is the
    * reference's shape (K1 dynamic partition overwrite — the merged
    * partition replaces the old in place); [[SnapshotSink]] lands the
    * SAME merged content through [[graft.ops.SnapshotTable.merge]],
    * so the daily watermark pipeline earns time travel, snapshot-
    * isolated readers, and replayable history end to end — content
    * per run is IDENTICAL by construction (both sinks run
    * [[Upsert.merge]]'s new-wins dedup over delta + touched
    * partitions; parity is spec-pinned). One semantic difference,
    * deliberate: a null partition value (a row whose date column
    * failed to parse) writes a `__HIVE_DEFAULT_PARTITION__` dir under
    * the overwrite sink but refuses LOUDLY under the snapshot sink —
    * a versioned table must never commit an entry whose path diverges
    * from its manifest key. */
  sealed trait Sink
  case object OverwriteSink extends Sink
  case object SnapshotSink extends Sink

  def flowOf(trigger: String): Flow = trigger match {
    case "OnDemand" => OnDemand
    case "Scheduled" => Scheduled
    case _ => NoOp
  }

  def selectTables(jobMode: String): Seq[TableSpec] = jobMode match {
    case "allTables" => Tables.active
    case name if Tables.registry.contains(name) &&
      Tables.registry(name).enabled => Seq(Tables.registry(name))
    case _ => Nil
  }

  /** One table, one batch: watermark filter -> bronze normalize ->
    * partition keys -> idempotent partitioned upsert. `source` is the
    * raw frame from CsvSource/JdbcSource; empty batches short-circuit
    * before the sink (gluejob.py:175-179). */
  def ingestTable(spark: SparkSession, spec: TableSpec, source: DataFrame,
      watermark: String, outRoot: String,
      sink: Sink = OverwriteSink): Boolean = {
    val delta = source.filter(
      coalesce(col(spec.updatedCol).cast("string"), lit("")) >= watermark)
    if (delta.isEmpty) false
    else {
      val bronze = PartitionKeys.withCompanyYearMonth(
        Normalize.toBronze(delta, spec), spec.dateCol)
      sink match {
        case OverwriteSink =>
          Upsert.upsertPartitioned(spark, bronze, s"$outRoot/${spec.name}",
            key = spec.idCol, tieBreak = spec.updatedCol)
        case SnapshotSink =>
          SnapshotTable.merge(spark, s"$outRoot/${spec.name}", bronze,
            key = spec.idCol, tieBreak = spec.updatedCol,
            partCols = Seq("company", "year", "month"))
      }
      true
    }
  }

  /** Initial CSV load: no watermark filter, no watermark advance
    * (gluejob.py:163-171); missing files skip the table. The sink
    * seam matches [[ingestTable]]'s, so an OnDemand-seeded snapshot
    * table carries history from VERSION 1 — the first incremental run
    * lands as version 2 and time travel reaches the seed (parity with
    * the overwrite sink is spec-pinned). */
  def initialLoad(spark: SparkSession, csvRoot: String, outRoot: String,
      tables: Seq[TableSpec] = Tables.active,
      sink: Sink = OverwriteSink): Seq[String] =
    tables.flatMap { spec =>
      val df = CsvSource.read(spark, spec, s"$csvRoot/${spec.name}.csv")
      if (df.isEmpty) None
      else {
        val bronze = PartitionKeys.withCompanyYearMonth(
          Normalize.toBronze(df, spec), spec.dateCol)
        sink match {
          case OverwriteSink =>
            Upsert.upsertPartitioned(spark, bronze,
              s"$outRoot/${spec.name}",
              key = spec.idCol, tieBreak = spec.updatedCol)
          case SnapshotSink =>
            // reserved SEED batch id: a replayed initial load finds
            // batch 0 at the head and no-ops like every other commit
            // here, so "the seed is version 1" stays true across
            // reruns (the content was always identical via new-wins
            // dedup; the id makes the HISTORY identical too)
            SnapshotTable.merge(spark, s"$outRoot/${spec.name}", bronze,
              key = spec.idCol, tieBreak = spec.updatedCol,
              partCols = Seq("company", "year", "month"),
              batchId = Some(0L))
        }
        Some(spec.name)
      }
    }

  /** Incremental run over pre-built source frames (the JDBC read in
    * prod; any frame in tests). `probeTime` is the source-DB time
    * captured at batch start (S5) — becomes the next watermark for every
    * table that ingested. Watermarks commit only after all succeed. */
  def incrementalRun(spark: SparkSession, store: WatermarkStore,
      sources: Map[String, DataFrame], probeTime: String, outRoot: String,
      tables: Seq[TableSpec] = Tables.active,
      sink: Sink = OverwriteSink): Seq[String] = {
    val done = tables.filter(t => sources.contains(t.name)).map { spec =>
      ingestTable(spark, spec, sources(spec.name), store.get(spec.name),
        outRoot, sink)
      store.advance(spec.name, probeTime)
      spec.name
    }
    store.commit()
    done
  }

  /** [[incrementalRun]] with bounded per-table parallelism. The
    * reference walks its tables strictly sequentially
    * (gluejob.py:306-327), leaving the cluster idle through every
    * small table's latency; on Spark each table's
    * filter→normalize→upsert is an independent job against a disjoint
    * output path, so the idiomatic upgrade is to submit tables from a
    * bounded driver pool and let the scheduler interleave their stages
    * across the executor pool. `parallelism` caps in-flight tables
    * (source-connection and driver-memory budget).
    *
    * Semantics are IDENTICAL to the sequential path: disjoint sinks
    * per table, watermarks read once up front on the caller thread,
    * advances + the single commit happen only after EVERY table
    * returned — any table's failure aborts the commit for all
    * (at-least-once, recovered by the idempotent upsert). */
  def incrementalRunParallel(spark: SparkSession, store: WatermarkStore,
      sources: Map[String, DataFrame], probeTime: String, outRoot: String,
      tables: Seq[TableSpec] = Tables.active,
      parallelism: Int = 4, sink: Sink = OverwriteSink): Seq[String] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    require(parallelism > 0)
    val selected = tables.filter(t => sources.contains(t.name))
    if (selected.isEmpty) { store.commit(); return Nil }
    // watermarks read on the caller thread — the store stays
    // single-threaded; futures only touch Spark
    val wms = selected.map(s => s.name -> store.get(s.name)).toMap
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, selected.size))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val done =
      try Await.result(
        Future.sequence(selected.map { spec =>
          Future {
            ingestTable(spark, spec, sources(spec.name), wms(spec.name),
              outRoot, sink)
            spec.name
          }
        }), Duration.Inf)
      finally pool.shutdown()
    selected.foreach(spec => store.advance(spec.name, probeTime))
    store.commit()
    done
  }
}
