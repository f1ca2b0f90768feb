package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.sources.DocStore

/** Round-9: the native DataSourceV2 document store — predicate
  * pushdown must reach the GENERATOR (pruned ids never produced),
  * column pruning must reach the ROW BUILDER (unprojected text never
  * rendered), and the scan must report both to Catalyst. */
class DocStoreSpec extends SparkSpec {

  private def store(n: Long = 1000L, slices: Int = 4): DataFrame =
    spark.read.format(classOf[DocStore].getName)
      .option("nDocs", n).option("slices", slices).load()

  private def scanDesc(df: DataFrame): String =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: BatchScanExec => b.scan.description()
    }.getOrElse(fail("no BatchScanExec in the plan"))

  test("doc_id range predicates push into the generator: only the " +
      "selected interval is ever produced, and the scan reports it") {
    val df = store().filter(col("doc_id") >= 100 && col("doc_id") < 200)
      .select("doc_id", "lang")
    val before = DocStore.rowsGenerated.get()
    assert(df.count() == 100)
    assert(DocStore.rowsGenerated.get() - before == 100,
      "pruned ids must never be generated, not generated-then-filtered")
    val d = scanDesc(df)
    assert(d.contains("[100, 200)") && d.contains("PushedFilters"),
      s"scan must report the pushed interval, got: $d")
  }

  test("EqualTo pins a single id; an unsatisfiable range plans zero " +
      "partitions and produces zero rows") {
    val one = store().filter(col("doc_id") === 7L)
    val before = DocStore.rowsGenerated.get()
    assert(one.count() == 1)
    assert(DocStore.rowsGenerated.get() - before == 1)
    val none = store().filter(col("doc_id") >= 900 && col("doc_id") < 100)
    assert(none.count() == 0)
  }

  test("column pruning reaches the row builder: text is rendered only " +
      "when projected") {
    val slim = store(200L).select("doc_id", "lang", "n_chars")
    val before = DocStore.textsRendered.get()
    assert(slim.count() == 200)
    assert(DocStore.textsRendered.get() == before,
      "unprojected text must never be rendered")
    assert(scanDesc(slim).contains("ReadSchema"))
    val wide = store(200L).select("doc_id", "text")
    wide.collect()
    assert(DocStore.textsRendered.get() - before == 200)
  }

  test("generated rows replay the 31-bit hash arithmetic exactly " +
      "(the q196 oracle's contract), and non-doc_id predicates stay " +
      "Spark-side and still apply") {
    val rows = store(50L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).sortBy(_._1)
    val want = (0L until 50L).map { id =>
      val a = (id * 2654435761L) % 2147483647L
      val b = (a * 48271L) % 2147483647L
      (id, DocStore.langs((a % 5).toInt), "src" + (b % 20),
        40L + b % 200L)
    }
    assert(rows.toSeq == want)
    val en = store(1000L).filter(col("lang") === "en")
    val wantEn = (0L until 1000L).count(id =>
      ((id * 2654435761L) % 2147483647L) % 5 == 0)
    assert(en.count() == wantEn.toLong)
  }

  test("slices become independent input partitions, and pushdown " +
      "narrows BEFORE slicing") {
    val df = store(10000L, slices = 8)
      .filter(col("doc_id") >= 0 && col("doc_id") < 16)
    assert(df.rdd.getNumPartitions == 8,
      "16 surviving ids across 8 slices: 2 ids per planned slice")
    assert(df.count() == 16)
  }
}
