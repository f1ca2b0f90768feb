package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi join for skewed keys.
  *
  * A plain shuffle join hash-partitions both sides on the key; with a
  * hot key (power-law user, 5-value enum, null bucket) one task gets
  * the whole hot partition and the stage runs at straggler speed — at
  * 100 TB that one task spills and dies. Salting multiplies key
  * cardinality: the BIG side spreads each key's rows across `salt`
  * sub-keys deterministically; the SMALL side is replicated once per
  * salt value, so every sub-partition joins locally. Cost: small side
  * ×salt (bounded — it's the dim side); benefit: hot-key partition
  * shrinks ×salt. AQE's skew-join split handles moderate skew
  * automatically (sort-merge only); explicit salting is the portable
  * fix that also covers hash joins and full-shuffle aggregations.
  */
object SkewJoin {

  /** Inner equi join `big ⋈ small ON key`, salted. The big-side salt
    * must be DETERMINISTIC (hash of the row's columns, never rand()) so
    * retried/speculative tasks re-derive the same salt — a rand() salt
    * silently duplicates or drops rows when a task retries. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int): DataFrame = {
    require(salt > 1, s"salt factor must be > 1 (got $salt)")
    val b = big.withColumn("_salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(salt)))
    val s = small.withColumn("_salt",
      explode(array((0 until salt).map(lit): _*)))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }
}
