package graft.streaming

import graft.ext.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ANN index maintenance — the composition of
  * [[graft.ext.Similarity.ivfPqUpsertIndex]]'s frozen-state fragment
  * map with Structured Streaming's foreachBatch: every micro-batch of
  * arriving vectors is assigned and PQ-encoded against the FROZEN
  * coarse quantizer + codebook (both broadcast, both trained once on
  * the base corpus) and appended to a cell-partitioned parquet index
  * that [[graft.ext.Similarity.ivfPqProbeIndex]] searches directly.
  *
  * Because a fragment is a per-row map against frozen state, appending
  * N micro-batch fragments yields the IDENTICAL index to one batch
  * build over all the data (spec-pinned) — streaming arrival order
  * never changes the index. Cell-partitioned storage means a probe
  * with `nProbe` cells reads only those directories.
  *
  * Delivery note: foreachBatch + blind append is at-least-once — a
  * retried batch would duplicate its rows. The checkpoint makes
  * replays batch-id-stable, so production hardening is either
  * batchId-keyed subdirectories (idempotent overwrite per batch) or a
  * MERGE into a table format with n_id as the key; the fragment
  * computation itself needs no change.
  */
object AnnIndexMaintenance {

  /** Start maintaining the index at `indexDir` from the streaming
    * `source` (must carry `idCol` and `vecCol`). `cents` and
    * `codebook` are the frozen quantizer/codebook the base index was
    * built with ([[graft.ext.Similarity.coarseCentroids]] /
    * [[graft.ext.Similarity.pqTrainCodebook]] shapes). */
  def start(source: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame, codebook: DataFrame, indexDir: String,
      checkpointDir: String, nSub: Int = 8, dim: Int = 64,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          Similarity.ivfPqIndexFragment(batch, idCol, vecCol, codebook,
              cents, nSub, dim)
            .write.mode("append").partitionBy("cell").parquet(indexDir)
        }
      }
      .start()
}
