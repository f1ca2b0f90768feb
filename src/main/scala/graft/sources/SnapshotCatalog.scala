package graft.sources

import graft.ops.SnapshotTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL CATALOG door over snapshot tables — the `VERSION AS OF` half
  * of the DSv2 surface: register once per session
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft",
  *     "graft.sources.SnapshotCatalog")
  * }}}
  * and every table dir is addressable from plain SQL, time travel
  * included:
  * {{{
  *   SELECT * FROM graft.`/data/events/t`                -- head
  *   SELECT * FROM graft.`/data/events/t` VERSION AS OF 3
  *   SELECT * FROM graft.`/data/events/t` VERSION AS OF 'train-v1'
  * }}}
  * (a non-numeric version string resolves as a NAMED TAG, or — when
  * no tag has the name — a writable BRANCH's staged head, the same
  * name/number duality Iceberg's SQL surface keeps). Identifiers are
  * PATHS (Delta's `delta.`path`` shape): a backtick-quoted single
  * part is the table dir; dotted parts join with `/`. Scans come from
  * the same [[SnapshotSourceTable]] the format door builds, so
  * pushdown, column pruning, and deletion-vector reads are identical
  * through every entry point. READ-ONLY by design: writes are
  * multi-job commit protocols (merge/mergeCdc/optimize) that a SQL
  * INSERT cannot express — create/alter/drop refuse loudly, naming
  * the Scala API. `TIMESTAMP AS OF` refuses: the manifest records
  * versions and tags, not wall-clock commit times (an mtime-derived
  * answer would be store-synthetic — the honest refusal beats a
  * wrong pin). */
class SnapshotCatalog extends TableCatalog {

  private var catName: String = "graft"

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = catName = name

  override def name(): String = catName

  private def dirOf(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString("/")

  private def load(ident: Identifier, version: Option[Long],
      ref: Option[String]): Table = {
    val dir = dirOf(ident)
    val spark = SparkSession.active
    try {
      val snap = ref.fold(SnapshotTable.resolve(spark, dir, version)) {
        n =>
          // the Iceberg name duality: a named ref is a TAG when one
          // exists, else a writable BRANCH's staged head — loud with
          // both namespaces' inventories when it is neither
          val t = SnapshotTable.tags(spark, dir)
          if (t.contains(n)) SnapshotTable.resolve(spark, dir, Some(t(n)))
          else {
            val bs = SnapshotTable.branches(spark, dir)
            require(bs.contains(n),
              s"no tag or branch '$n' on $dir (tags: " +
                s"${t.keys.toSeq.sorted.mkString(", ")}; branches: " +
                s"${bs.keys.toSeq.sorted.mkString(", ")})")
            SnapshotTable.resolveBranch(spark, dir, n)
          }
      }
      new SnapshotSourceTable(dir, snap)
    } catch {
      case e: IllegalArgumentException
          if e.getMessage != null &&
            e.getMessage.contains("no snapshot table") =>
        throw new org.apache.spark.sql.catalyst.analysis
          .NoSuchTableException(
            (ident.namespace() :+ ident.name()).toSeq)
    }
  }

  override def loadTable(ident: Identifier): Table =
    load(ident, None, None)

  /** `VERSION AS OF <v>` — a number pins a version, anything else
    * resolves as a named tag, or a branch when no tag matches. */
  override def loadTable(ident: Identifier, version: String): Table =
    version.toLongOption match {
      case Some(v) => load(ident, Some(v), None)
      case None => load(ident, None, Some(version))
    }

  override def loadTable(ident: Identifier, timestamp: Long): Table =
    throw new UnsupportedOperationException(
      "TIMESTAMP AS OF is not supported: the manifest records versions " +
        "and tags, not wall-clock commit times — pin a version " +
        "(VERSION AS OF <n>) or a tag (VERSION AS OF '<name>')")

  override def tableExists(ident: Identifier): Boolean =
    SnapshotTable.versions(SparkSession.active, dirOf(ident)).nonEmpty

  /** Namespaces are filesystem paths — there is no enumerable table
    * universe to list (the catalog is path-addressed, Delta's shape). */
  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"$op is not supported: snapshot tables are read-only from SQL — " +
        "writes are commit protocols (SnapshotTable.merge/mergeCdc/" +
        "optimize/deleteKeys), not single-job INSERTs")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    readOnly("CREATE TABLE")

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = readOnly("ALTER TABLE")

  override def dropTable(ident: Identifier): Boolean =
    readOnly("DROP TABLE")

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = readOnly("RENAME TABLE")
}
