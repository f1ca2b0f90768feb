package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD-2 (slowly-changing-dimension type 2) versioning: turn an
  * append-only change feed (the reference's ingest output — rows keyed
  * by id with an updated_at) into interval versions
  * `[valid_from, valid_to)` with a current flag.
  *
  * One window (`partitionBy key, orderBy ts`) — a single hash shuffle
  * on the key, then a per-partition sort; no self-join. At scale the
  * key (entity id) is high-cardinality, so partitions stay balanced
  * and the sort is small per key.
  */
object Scd2 {

  /** `valid_from` = the row's change timestamp, `valid_to` = next
    * version's timestamp (null while current), `is_current` = no later
    * version exists. If `ts` can tie within a key (true for the ingest
    * feed only before [[Upsert]] dedup), pass `tieBreak` columns to pin
    * a total order — a nondeterministic window order would make retried
    * tasks disagree on version boundaries. */
  def versions(df: DataFrame, key: String, ts: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy((col(ts) +: tieBreak.map(col)): _*)
    df.withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
