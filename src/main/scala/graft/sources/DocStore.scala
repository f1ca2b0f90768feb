package graft.sources

import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A native DataSourceV2 table — a deterministic synthetic document
  * store with REAL scan-level optimization hooks, the engine-side
  * counterpart of the parquet/JDBC pushdown this library already
  * pins: `doc_id` range predicates push INTO the generator (pruned
  * ids are never generated, not generated-then-filtered — the DSv2
  * analogue of partition pruning), and column pruning reaches the
  * row builder (an un-projected `text` is never rendered). Catalyst
  * sees both in the scan node (`PushedFilters: [...]`, pruned
  * `ReadSchema`), exactly like a file source.
  *
  * Generation is splitless integer arithmetic in the 31-bit
  * multiplicative-hash family the engine already uses for portable
  * sampling ([[graft.ext.Sampling.hashSplit]]'s hash31): every column
  * derives from `(doc_id · 2654435761) mod (2³¹−1)` — products stay
  * under 2⁶³, so an external engine replays rows exactly (q196's
  * oracle generates the identical table from `range()`), unlike a
  * splitmix64 generator whose wrapping 64-bit multiplies a
  * raise-on-overflow SQL engine cannot express.
  *
  * Scale shape: `slices` contiguous id ranges become independent
  * input partitions (a 1000-executor cluster reads 1000 slices with
  * zero coordination — the generator is a pure function of the id);
  * pushdown composes BEFORE slicing, so a narrow range plans few
  * partitions instead of planning all and emptying most.
  *
  * Usage: `spark.read.format(classOf[DocStore].getName)
  * .option("nDocs", n).option("slices", k).load()`. */
class DocStore extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DocStore.schema

  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val nDocs = Option(opts.get("ndocs")).map(_.toLong)
      .getOrElse(throw new IllegalArgumentException(
        "docstore requires option nDocs"))
    val slices = Option(opts.get("slices")).map(_.toInt).getOrElse(8)
    require(nDocs >= 0 && slices > 0,
      s"need nDocs >= 0 and slices > 0, got nDocs=$nDocs slices=$slices")
    new DocStoreTable(nDocs, slices)
  }
}

object DocStore {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private[graft] val langs = Array("en", "de", "fr", "es", "pt")

  private[sources] val vocab = Array("spark", "window", "merge",
    "table", "column", "vector", "stream", "value", "data", "small",
    "join", "group", "batch", "shard", "token", "index", "query",
    "plan", "scan", "sort", "hash", "range", "count", "stage", "node",
    "edge", "graph", "text", "line", "word")

  /** 31-bit multiplicative hashes — every product < 2⁶³, replayable
    * in any BIGINT engine. */
  private[sources] def hashA(id: Long): Long =
    (id * 2654435761L) % 2147483647L
  private[sources] def hashB(a: Long): Long = (a * 48271L) % 2147483647L

  /** Rows actually generated across all readers in this JVM — spec
    * observability for "pruned ids are never generated". */
  private[graft] val rowsGenerated = new AtomicLong(0L)

  /** Text cells actually rendered — spec observability for "pruned
    * columns are never computed". */
  private[graft] val textsRendered = new AtomicLong(0L)
}

private[sources] class DocStoreTable(nDocs: Long, slices: Int)
    extends Table with SupportsRead {

  override def name(): String = s"docstore($nDocs)"
  override def schema(): StructType = DocStore.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new DocScanBuilder(nDocs, slices)
}

/** Pushdown state: the id interval [lo, hi) narrows as doc_id
  * predicates arrive; accepted filters are FULLY enforced by the
  * generator (exact interval arithmetic), so Spark drops its own
  * post-scan copies. Anything not on doc_id is rejected back for
  * Spark-side evaluation. */
private[sources] class DocScanBuilder(nDocs: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = nDocs
  private var accepted = Array.empty[Filter]
  private var required = DocStore.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition {
      case EqualTo("doc_id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case GreaterThan("doc_id", v: Long) =>
        lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("doc_id", v: Long) =>
        lo = math.max(lo, v); true
      case LessThan("doc_id", v: Long) =>
        hi = math.min(hi, v); true
      case LessThanOrEqual("doc_id", v: Long) =>
        hi = math.min(hi, v + 1); true
      case IsNotNull("doc_id") => true // non-nullable: vacuous
      case _ => false
    }
    accepted = ok
    rest
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new DocScan(lo, math.max(lo, hi), slices, required, accepted)
}

private[sources] class DocScan(lo: Long, hi: Long, slices: Int,
    required: StructType, pushed: Array[Filter])
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def description(): String =
    s"docstore [$lo, $hi) PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    if (n <= 0) Array.empty
    else {
      val per = (n + slices - 1) / slices
      (lo until hi by per)
        .map(s => DocRange(s, math.min(s + per, hi)): InputPartition)
        .toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DocReaderFactory(required.fieldNames)
}

private[sources] case class DocRange(lo: Long, hi: Long)
    extends InputPartition

private[sources] class DocReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[DocRange]
    new DocReader(r.lo, r.hi, fields)
  }
}

private[sources] class DocReader(lo: Long, hi: Long,
    fields: Array[String]) extends PartitionReader[InternalRow] {

  private var id = lo - 1

  override def next(): Boolean = { id += 1; id < hi }

  override def get(): InternalRow = {
    DocStore.rowsGenerated.incrementAndGet()
    val a = DocStore.hashA(id)
    lazy val b = DocStore.hashB(a)
    val vals: Array[Any] = fields.map {
      case "doc_id" => id
      case "lang" =>
        UTF8String.fromString(DocStore.langs((a % 5).toInt))
      case "source" =>
        UTF8String.fromString("src" + (b % 20))
      case "n_chars" => 40L + b % 200L
      case "text" =>
        DocStore.textsRendered.incrementAndGet()
        UTF8String.fromString(
          DocStore.vocab((a % 30).toInt) + " " +
            DocStore.vocab((b % 30).toInt) + " " +
            DocStore.vocab(((a + b) % 30).toInt))
    }
    new GenericInternalRow(vals)
  }

  override def close(): Unit = ()
}
