package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed
  * for the 100 TB shuffle profile:
  *
  *  - exact / normalized-key dedup: one hash-partitioned aggregation on
  *    the (cheap, already-small) key — the canonical map-side-combinable
  *    groupBy.
  *  - blocked n-gram Jaccard: candidate pairs only *within* a blocking
  *    key (language × length bucket), so the self-join shuffles each
  *    block independently — no global cross join ever materializes.
  *  - MinHash + LSH banding: signatures are a fixed-width column (32
  *    longs) per doc; candidates come from an equi-join on (band,
  *    bandHash) — the classic shingle→minhash→band→bucket-join plan
  *    whose shuffle volume is #docs × #bands tiny rows.
  *  - SimHash: 64-bit fingerprint; near-pairs via the pigeonhole band
  *    join (hamming ≤ k ⇒ some 16-bit chunk equal), then exact
  *    `bit_count(xor)` verify.
  */
object Dedup {

  // ---- exact -------------------------------------------------------------

  /** Exact duplicate groups by raw text: keeper = min id (deterministic),
    * group size. One shuffle, map-side combinable. */
  def exactGroups(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))
      .select(col("keeper_id"), col("n_copies"))

  /** Whitespace/case-normalized key — catches trivially-reformatted
    * duplicates that raw equality misses. */
  def normKey(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  def normalizedGroups(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(normKey(col(textCol)).as("k"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))
      .select(col("keeper_id"), col("n_copies"))

  // ---- character shingles + exact Jaccard --------------------------------

  /** Distinct k-char shingles via explicit 1-based substring positions
    * (oracle-portable; docs shorter than k yield no shingles). */
  def shingles(text: Column, k: Int): Column =
    when(length(text) < k, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), length(text) - (k - 1)),
        i => text.substr(i, lit(k)))))

  /** Exact Jaccard over pre-distinct shingle arrays; |A∪B| by
    * inclusion-exclusion (deterministic integer arithmetic). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val uni = size(a) + size(b) - inter
    when(uni === 0, lit(0.0)).otherwise(inter * lit(1.0) / uni)
  }

  /** Near-duplicate pairs by *blocked* exact Jaccard: candidates are
    * restricted to identical (blockCols) — e.g. language + length
    * bucket — then exact k-shingle Jaccard ≥ threshold. Deterministic
    * and oracle-checkable; the blocking bounds the pair count so each
    * block's self-join is an independent, shuffle-local task. */
  def ngramJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
      blockCols: Seq[Column], k: Int, threshold: Double): DataFrame = {
    val base = docs
      .withColumn("_block", concat_ws("", blockCols: _*))
      .select(col(idCol).as("_id"), col("_block"),
        shingles(col(textCol), k).as("_sh"))
      .filter(size(col("_sh")) > 0)
    val a = base.select(col("_id").as("doc_a"), col("_block"),
      col("_sh").as("_sha"))
    val b = base.select(col("_id").as("doc_b"), col("_block"),
      col("_sh").as("_shb"))
    a.join(b, Seq("_block"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard", jaccard(col("_sha"), col("_shb")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  // ---- MinHash + LSH -----------------------------------------------------

  /** Universal-hash parameters for the MinHash permutations,
    * deterministic from a fixed seed. p = 2^31-1 (Mersenne prime) keeps
    * a*h+b < 2^62 — no long overflow under ANSI arithmetic. */
  private val MinHashP = 2147483647L
  private def perms(n: Int, seed: Long): Seq[(Long, Long)] = {
    val r = new scala.util.Random(seed)
    Seq.fill(n)((math.abs(r.nextLong()) % (MinHashP - 1) + 1,
      math.abs(r.nextLong()) % MinHashP))
  }

  /** MinHash signature: for each permutation i, min over shingle hashes
    * of (a_i*h + b_i) mod p. Shingle base hash = xxhash64 (codegen'd). */
  def minHashSignature(sh: Column, numPerms: Int = 32,
      seed: Long = 42L): Column = {
    val hashes = transform(sh, s => pmod(xxhash64(s), lit(MinHashP)))
    val sig = perms(numPerms, seed).map { case (a, b) =>
      array_min(transform(hashes,
        h => pmod(h * lit(a) + lit(b), lit(MinHashP))))
    }
    array(sig: _*)
  }

  /** LSH near-dup pairs: signature → bands of `rowsPerBand` → explode →
    * equi-join on (band, bandHash) → exact Jaccard verify ≥ threshold.
    * Shuffle volume is #docs × #bands small rows; the verify join
    * re-reads only candidate shingle sets. */
  def minHashLshPairs(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 5, numPerms: Int = 32, rowsPerBand: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val numBands = numPerms / rowsPerBand
    val base = docs.select(col(idCol).as("_id"),
        shingles(col(textCol), k).as("_sh"))
      .filter(size(col("_sh")) > 0)
      .withColumn("_sig", minHashSignature(col("_sh"), numPerms))
    val banded = base.select(col("_id"), col("_sh"),
      explode(transform(sequence(lit(0), lit(numBands - 1)),
        b => struct(b.as("band"),
          xxhash64(slice(col("_sig"), b * rowsPerBand + 1, lit(rowsPerBand)))
            .as("bh")))).as("_band"))
      .select(col("_id"), col("_sh"),
        col("_band.band").as("_bandNo"), col("_band.bh").as("_bandHash"))
    val a = banded.select(col("_id").as("doc_a"), col("_sh").as("_sha"),
      col("_bandNo"), col("_bandHash"))
    val b = banded.select(col("_id").as("doc_b"), col("_sh").as("_shb"),
      col("_bandNo"), col("_bandHash"))
    a.join(b, Seq("_bandNo", "_bandHash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("_sha"), col("_shb"))
      .dropDuplicates("doc_a", "doc_b") // candidate may fire in >1 band
      .withColumn("jaccard", jaccard(col("_sha"), col("_shb")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  // ---- SimHash -----------------------------------------------------------

  /** 64-bit SimHash over whitespace tokens: per bit, sum +1/-1 of each
    * token-hash bit, sign → fingerprint bit. Expressed as a 64-wide
    * aggregate of array lanes — per-row, no shuffle. */
  def simHash64(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    val lanes = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (a, i) => a + when(call_function("shiftright", h, i).bitwiseAND(1) === 1,
            lit(1L)).otherwise(lit(-1L)))
      })
    aggregate(
      zip_with(lanes, sequence(lit(0), lit(63)),
        (v, i) => when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Near-pairs with hamming(simhash) ≤ maxDist via pigeonhole banding:
    * split 64 bits into `chunks` chunks; distance ≤ chunks-1 guarantees
    * an equal chunk, so an equi-join on (chunkNo, chunkValue) finds all
    * such pairs; exact bit_count(xor) verifies. */
  def simHashPairs(docs: DataFrame, textCol: String, idCol: String,
      maxDist: Int = 3, chunks: Int = 4): DataFrame = {
    val width = 64 / chunks
    val base = docs.select(col(idCol).as("_id"),
        simHash64(col(textCol)).as("_fp"))
      .withColumn("_chunk", explode(transform(
        sequence(lit(0), lit(chunks - 1)),
        c => struct(c.as("no"),
          call_function("shiftright", col("_fp"), c * width)
            .bitwiseAND(lit((1L << width) - 1)).as("v")))))
      .select(col("_id"), col("_fp"),
        col("_chunk.no").as("_cno"), col("_chunk.v").as("_cv"))
    val a = base.select(col("_id").as("doc_a"), col("_fp").as("_fpa"),
      col("_cno"), col("_cv"))
    val b = base.select(col("_id").as("doc_b"), col("_fp").as("_fpb"),
      col("_cno"), col("_cv"))
    a.join(b, Seq("_cno", "_cv"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("_fpa").bitwiseXOR(col("_fpb"))).as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= maxDist)
  }
}
