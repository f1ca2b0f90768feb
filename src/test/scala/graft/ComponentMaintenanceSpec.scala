package graft

import org.apache.spark.sql.functions.{col, concat_ws}

import graft.ext.GraphOps
import graft.streaming.ComponentMaintenance

/** Round-9: streaming connected-components maintenance — N
  * micro-batches of edges fold to the same labeling as one batch CC
  * over the union (labels are reachability minima, split-invariant),
  * and a replayed batchId reproduces its original snapshot even
  * after later batches have landed. */
class ComponentMaintenanceSpec extends SparkSpec {

  import spark.implicits._

  test("micro-batched edge folds == batch CC over the union; replay " +
      "of an old batchId ignores the future and converges") {
    // three chains that successive batches progressively merge
    val edges = (0L until 30L).map(i => (i, i + 1)) ++
      (100L until 130L).map(i => (i, i + 1)) ++
      (200L until 230L).map(i => (i, i + 1)) ++
      Seq((15L, 115L), (115L, 215L)) // cross-chain merges
    val landing = tmpDir("ccmlanding")
    val edgesDir = tmpDir("ccmedges")
    val labelsDir = tmpDir("ccmlabels")
    val ckpt = tmpDir("ccmckpt")
    edges.toDF("src", "dst")
      .repartitionByRange(4, col("src"))
      .write.mode("overwrite").parquet(landing)
    val src = spark.readStream
      .schema(spark.read.parquet(landing).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(landing)
    val q = ComponentMaintenance.start(src, "src", "dst",
      edgesDir, labelsDir, ckpt)
    q.awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(concat_ws("|", col("node"), col("component")))
        .collect().map(_.getString(0)).toSet
    val last = ComponentMaintenance.readLabels(spark, labelsDir).get
    val batchCc = GraphOps.connectedComponents(
      edges.toDF("src", "dst"), "src", "dst")
    assert(rows(last) == rows(batchCc),
      "the final snapshot must equal the batch CC over all edges")
    // everything merged into one component rooted at 0 eventually
    assert(last.select("component").distinct().count() == 1)
    // replay: recompute batch 1's snapshot after batches 2..n landed —
    // warm reads are bounded beforeBatch, so bytes must match
    val batch1Edges = spark.read.parquet(s"$edgesDir/batch=1")
    val before = rows(spark.read.parquet(s"$labelsDir/batch=1"))
    ComponentMaintenance.processBatch(batch1Edges, 1L, "src", "dst",
      edgesDir, labelsDir)
    assert(rows(spark.read.parquet(s"$labelsDir/batch=1")) == before,
      "replaying batch 1 after later batches must reproduce its bytes")
  }
}
