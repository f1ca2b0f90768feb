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

  /** Distinct k-char shingles, single-pass custom expression
    * (oracle-portable; docs shorter than k yield no shingles). */
  def shingles(text: Column, k: Int): Column =
    graft.functions.VectorFunctions.shingles(text, k, word = false)

  /** Exact Jaccard over pre-distinct shingle arrays. Single-pass custom
    * expression (one hash-set build + probe per pair) — the composed
    * size(array_intersect)/inclusion-exclusion tree rebuilds its hash
    * set once per consumer after project-collapse. Same value. */
  def jaccard(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.jaccardSim(a, b)

  /** Distinct word n-gram shingles (space-joined token windows),
    * single-pass custom expression. */
  def wordShingles(text: Column, n: Int): Column =
    graft.functions.VectorFunctions.shingles(text, n, word = true)

  /** Near-duplicate pairs by *blocked* exact Jaccard: candidates are
    * restricted to identical (blockCols) — e.g. language + length
    * bucket — then exact Jaccard over word n-gram shingles ≥ threshold
    * (word grams: ~5× smaller sets than char grams at equal recall on
    * prose). Deterministic and oracle-checkable; the blocking bounds
    * the pair count so each block's self-join is an independent,
    * shuffle-local task. */
  def ngramJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
      blockCols: Seq[Column], n: Int, threshold: Double): DataFrame = {
    val base = docs
      .withColumn("_block", concat_ws("", blockCols: _*))
      .select(col(idCol).as("_id"), col("_block"),
        sort_array(wordShingles(col(textCol), n)).as("_sh"))
      .filter(size(col("_sh")) > 0)
    // PPJoin-style prefix filter: J(A,B) >= t implies A and B share a
    // shingle within each one's first |S| - ceil(t*|S|) + 1 elements of
    // the global (sorted) order — so candidates come from an equi-join
    // on prefix shingles, not the full blocked cross product. Exact:
    // no false negatives; ceil's double rounding can only lengthen the
    // prefix (longer = safe).
    val prefLen = size(col("_sh")) -
      ceil(size(col("_sh")) * lit(threshold)).cast("int") + lit(1)
    val pref = base.select(col("_id"), col("_block"),
      explode(slice(col("_sh"), lit(1), prefLen)).as("_tok"))
    val cand = pref.select(col("_id").as("doc_a"), col("_block"), col("_tok"))
      .join(pref.select(col("_id").as("doc_b"), col("_block"), col("_tok")),
        Seq("_block", "_tok"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    cand
      .join(base.select(col("_id").as("doc_a"), col("_sh").as("_sha")),
        Seq("doc_a"))
      .join(base.select(col("_id").as("doc_b"), col("_sh").as("_shb")),
        Seq("doc_b"))
      .withColumn("jaccard", graft.functions.VectorFunctions
        .jaccardSorted(col("_sha"), col("_shb")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Near-duplicate CLUSTERS: connected components over the blocked-
    * Jaccard pair graph, labels = min doc id per component (the keeper).
    * Iterative min-label propagation — each round is one join + one
    * map-side-combinable aggregation, lineage cut per round with
    * localCheckpoint; converges in O(component diameter) rounds (dup
    * clusters are shallow). Docs with no near-dup are singleton
    * clusters of themselves. */
  def dupClusters(docs: DataFrame, textCol: String, idCol: String,
      blockCols: Seq[Column], n: Int, threshold: Double,
      maxIters: Int = 15): DataFrame = {
    val pairs = ngramJaccardPairs(docs, textCol, idCol, blockCols, n,
      threshold).select(col("doc_a"), col("doc_b"))
    val edges = pairs.unionByName(
      pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .localCheckpoint()
    var labels = docs.select(col(idCol).as("node"), col(idCol).as("lbl"))
      .localCheckpoint()
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("node").as("doc_b"), col("lbl").as("_nl")),
          Seq("doc_b"))
        .groupBy(col("doc_a")).agg(min(col("_nl")).as("_nmin"))
      val next = labels
        .join(nbrMin.select(col("doc_a").as("node"), col("_nmin")),
          Seq("node"), "left")
        .select(col("node"),
          least(col("lbl"), coalesce(col("_nmin"), col("lbl"))).as("lbl"))
        .localCheckpoint()
      val changed = next.join(labels.select(col("node"),
          col("lbl").as("_old")), Seq("node"))
        .filter(col("lbl") =!= col("_old")).count()
      labels = next
      converged = changed == 0
      it += 1
    }
    labels.select(col("node").as("doc_id"), col("lbl").as("cluster_id"))
  }

  // ---- MinHash + LSH -----------------------------------------------------

  /** MinHash modulus: 2^31-1 (Mersenne prime) keeps a*h+b < 2^62 — no
    * long overflow under ANSI arithmetic. Permutation params live in
    * graft.functions.MinHashSig (same seed derivation). */
  private val MinHashP = 2147483647L

  /** MinHash signature: for each permutation i, min over shingle hashes
    * of (a_i*h + b_i) mod p. Shingle base hash = xxhash64 (codegen'd);
    * the numPerms×shingles min-plane runs in the custom MinHashSig
    * expression (one JVM loop) instead of numPerms interpreted array
    * traversals. Permutation params derive from the same seed. */
  def minHashSignature(sh: Column, numPerms: Int = 32,
      seed: Long = 42L): Column =
    graft.functions.VectorFunctions.minHashSig(sh, numPerms, seed)

  /** LSH near-dup pairs over word n-gram shingles: signature → bands
    * of `rowsPerBand` → explode → equi-join on (band, bandHash) →
    * exact Jaccard verify ≥ threshold. Shuffle volume is #docs × #bands
    * small rows; the verify join attaches shingle sets only to the
    * (band-collided) candidate pairs. */
  def minHashLshPairs(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3, numPerms: Int = 32, rowsPerBand: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val numBands = numPerms / rowsPerBand
    val base = docs.select(col(idCol).as("_id"),
        sort_array(wordShingles(col(textCol), n)).as("_sh"))
      .filter(size(col("_sh")) > 0)
    // banded rows are SLIM (id, bandNo, bandHash) — the shingle arrays
    // never ride through the candidate join or the pair-dedup shuffle.
    val banded = base
      .withColumn("_sig", minHashSignature(col("_sh"), numPerms))
      .select(col("_id"),
        explode(transform(sequence(lit(0), lit(numBands - 1)),
          b => struct(b.as("band"),
            xxhash64(slice(col("_sig"), b * rowsPerBand + 1, lit(rowsPerBand)))
              .as("bh")))).as("_band"))
      .select(col("_id"),
        col("_band.band").as("_bandNo"), col("_band.bh").as("_bandHash"))
    val cand = banded.select(col("_id").as("doc_a"), col("_bandNo"),
        col("_bandHash"))
      .join(banded.select(col("_id").as("doc_b"), col("_bandNo"),
        col("_bandHash")), Seq("_bandNo", "_bandHash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct() // candidate may fire in >1 band
    // verify: attach shingle sets back to the (small) candidate set
    cand
      .join(base.select(col("_id").as("doc_a"), col("_sh").as("_sha")),
        Seq("doc_a"))
      .join(base.select(col("_id").as("doc_b"), col("_sh").as("_shb")),
        Seq("doc_b"))
      .withColumn("jaccard", graft.functions.VectorFunctions
        .jaccardSorted(col("_sha"), col("_shb")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  // ---- SimHash -----------------------------------------------------------

  /** 64-bit SimHash over whitespace tokens: per bit, sign of the +1/-1
    * sum across token xxhash64 bits. One JVM loop per row (custom
    * expression) — per-row, no shuffle. */
  def simHash64(text: Column): Column =
    graft.functions.VectorFunctions.simHash64(text)

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
