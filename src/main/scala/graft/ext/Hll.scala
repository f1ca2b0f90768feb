package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable register-sketch cardinality estimation (the
  * Flajolet–Martin / HyperLogLog family: Flajolet et al., AofA 2007).
  * Spark's built-in `approx_count_distinct` IS an HLL++ — but its
  * registers ride engine-internal xxhash64, so its estimates can
  * never be value-checked by another engine (that is exactly why the
  * original q44/q99 sketch queries were retired to spec-only
  * coverage). This variant runs the same register discipline over the
  * catalog's portable polynomial hash chain, so every register and
  * the final estimate replay exactly in ANSI SQL: the sketch
  * DASHBOARD (per-key estimate + occupancy + exact error) becomes a
  * hash-checkable catalog row instead of a trust-me number.
  *
  * Register rule (trailing-zero PCSA rank, integer-only): for item
  * hash h, bucket = h mod m, rank = tz(h div m) + 1 capped at
  * `maxRank` (tz via `bit_count((x & -x) − 1)` — both engines compute
  * it branch-free on BIGINT). Register M_j = max rank in bucket j —
  * max is duplicate-idempotent, so the input needs NO distinct pass:
  * the whole sketch is one map + one (key, bucket)-keyed agg with
  * map-side combine, the shape that survives 100 TB where an exact
  * `count(DISTINCT)` shuffles every value.
  *
  * Estimate, exact-integer: Z = Σ_j 2^(maxRank − M_j) with absent
  * buckets contributing 2^maxRank (M = 0), then
  * est = (alphaMicro · m² · 2^maxRank) div Z div 1e6 — all DECIMAL(38)
  * products, so both engines land the identical integer. alphaMicro
  * pins α_64 = 0.709213 (the published HLL bias constant for m = 64)
  * in micro-units. */
object Hll {

  /** Linear-counting lookup: lnMicro(v) = round(ln(m / v)·1e6) for
    * v = 1..m−1 empty buckets. Small-range estimates (n ≪ m) come
    * from m·ln(m/V) (Whang et al. 1990), not the harmonic mean — raw
    * HLL overestimates ~2× down there. `ln` is not correctly-rounded
    * across libms, so the VALUE TABLE is pinned here once and
    * injected verbatim into both the Spark plan and the oracle SQL:
    * the constants, not the transcendental, cross the engine
    * boundary. */
  def linearCountTableMicro(m: Int): IndexedSeq[Long] =
    (1 until m).map(v => math.round(math.log(m.toDouble / v) * 1e6))

  /** Per-key register sketch + estimate over a pre-hashed item
    * column. Returns (keyCol, n_buckets_hit, hll_est) — one row per
    * key, registers never leave the agg.
    *
    * The input hash is passed through a 32-bit xorshift-multiply
    * finalizer (Wang-style avalanche, two rounds of
    * `(h ^ h>>16) * 73244475 mod 2^32`) BEFORE bucketing: the
    * portable polynomial chain has no low-bit avalanche — documents
    * whose tokens end in consecutive numerals hash to consecutive
    * integers, which collapse to a handful of distinct `h div m`
    * values and destroy the register statistics (measured: 5000
    * sequential tokens → 271 distinct rests → estimate 793). The
    * finalizer is three xors, two multiplies, and two mods on
    * sub-2^60 Longs, so it replays exactly in ANSI SQL (DuckDB
    * raises on BIGINT overflow rather than wrapping — every
    * intermediate here stays below 3.2e17). */
  def registerEstimate(df: DataFrame, keyCol: String, hashCol: Column,
      m: Int = 64, maxRank: Int = 30,
      alphaMicro: Long = 709213L): DataFrame =
    estimateFromRegisters(registers(df, keyCol, hashCol, m, maxRank),
      keyCol, m, maxRank, alphaMicro)

  /** The register table alone: per (key, bucket) the max rank —
    * integer state, mergeable EXACTLY by a further max (unlike
    * float-merged sketch families), which is what the streaming
    * maintenance twin rides. Returns (keyCol, bkt, reg). */
  def registers(df: DataFrame, keyCol: String, hashCol: Column,
      m: Int = 64, maxRank: Int = 30): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0, s"m must be a power of 2, got $m")
    require(maxRank >= 1 && maxRank <= 60)
    df
      // mask to 32 bits BEFORE the finalizer: its multiply is
      // overflow-safe only for sub-2^32 inputs (DuckDB raises on
      // BIGINT overflow), and this lets raw ids — not just sub-2^31
      // poly hashes — feed the sketch directly
      .withColumn("_h0", pmod(hashCol.cast("long"), lit(4294967296L)))
      .withColumn("_g1", expr(
        "((_h0 ^ shiftright(_h0, 16)) * 73244475L) % 4294967296L"))
      .withColumn("_g2", expr(
        "((_g1 ^ shiftright(_g1, 16)) * 73244475L) % 4294967296L"))
      .withColumn("_hh", expr("_g2 ^ shiftright(_g2, 16)"))
      .withColumn("_bkt", pmod(col("_hh"), lit(m.toLong)))
      .withColumn("_rest", expr(s"_hh div ${m}L"))
      .withColumn("_rank",
        when(col("_rest") === 0, lit(maxRank))
          .otherwise(least(
            expr("bit_count((_rest & -_rest) - 1) + 1").cast("int"),
            lit(maxRank))))
      .groupBy(col(keyCol), col("_bkt").as("bkt"))
      .agg(max(col("_rank")).as("reg"))
      .select(col(keyCol), col("bkt"), col("reg"))
  }

  /** Estimate from a (keyCol, bkt, reg) register table (the
    * [[registers]] output or an exact max-merge of several). */
  def estimateFromRegisters(regTable: DataFrame, keyCol: String,
      m: Int = 64, maxRank: Int = 30,
      alphaMicro: Long = 709213L): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0, s"m must be a power of 2, got $m")
    require(maxRank >= 1 && maxRank <= 60)
    val regs = regTable.select(col(keyCol), col("bkt"),
      col("reg").as("_m"))
    val shift = 1L << maxRank
    val lnTab = linearCountTableMicro(m)
    val withRaw = regs.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_buckets_hit"),
        // 2^(maxRank − M_j): pure Long shifts (M_j ≤ maxRank ≤ 60)
        sum(expr(s"shiftleft(1L, $maxRank - _m)")).as("_zHit"))
      .withColumn("_z", expr(
        s"_zHit + CAST(($m - n_buckets_hit) AS DECIMAL(38,0)) * ${shift}L"))
      .withColumn("_raw", expr(
        s"CAST(CAST(${alphaMicro}L AS DECIMAL(38,0)) * ${m.toLong * m}L " +
          s"* ${shift}L div _z div 1000000 AS BIGINT)"))
    // small-range correction (standard HLL rule): raw ≤ 2.5·m with
    // empty buckets → linear counting m·ln(m/V) from the pinned table
    val lnArr = array(lnTab.map(lit): _*)
    withRaw
      .withColumn("_v", lit(m.toLong) - col("n_buckets_hit"))
      // greatest(_v, 1): keeps the eager index valid when every
      // bucket is hit (_v = 0 never reaches the linear-count branch)
      .withColumn("_lnm",
        element_at(lnArr, greatest(col("_v"), lit(1L)).cast("int")))
      .withColumn("hll_est",
        when(col("_raw") <= lit(5L * m / 2) && col("_v") > 0,
          expr(s"(${m}L * _lnm) div 1000000L"))
          .otherwise(col("_raw")))
      .select(col(keyCol), col("n_buckets_hit"), col("hll_est"))
  }
}
