package graft

import graft.ext.{Dedup, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Round-6: portable-oracle surface for the sketch family (LSH band
  * stats, portable SimHash) and the residual-PQ encode. */
class Ext6Spec extends SparkSpec {

  private def docs: DataFrame =
    spark.read.parquet(s"${sf()}/documents.parquet")
  private def emb: DataFrame =
    spark.read.parquet(s"${sf()}/embeddings.parquet")

  // ---- minHashBandStats --------------------------------------------------

  test("band-stats histogram partitions every banded doc, once per band") {
    val stats = Dedup.minHashBandStats(docs, "text", "doc_id",
      n = 3, numPerms = 16, rowsPerBand = 4).collect()
    val bands = stats.map(_.getInt(0)).toSet
    assert(bands == Set(0, 1, 2, 3))
    // every doc with >= 1 shingle lands in exactly one bucket per band,
    // so each band's occupancy-weighted bucket count == #banded docs
    val banded = docs.select(col("doc_id"),
        Dedup.wordShingles(col("text"), 3).as("_sh"))
      .filter(size(col("_sh")) > 0).count()
    val perBand = stats.groupBy(_.getInt(0)).view.mapValues(
      _.map(r => r.getLong(1) * r.getLong(2)).sum)
    perBand.foreach { case (b, total) =>
      assert(total == banded, s"band $b covers $total of $banded docs")
    }
  }

  test("band-stats candidate cost formula matches the actual candidate join") {
    // sum of C(size, 2) over buckets == banded candidate pairs with
    // multiplicity — the dashboard must predict the join the user runs
    val stats = Dedup.minHashBandStats(docs, "text", "doc_id").collect()
    val predicted = stats.map(r =>
      r.getLong(2) * (r.getLong(1) * (r.getLong(1) - 1)) / 2).sum
    // recompute the with-multiplicity pair count from the raw banding
    val base = docs.select(col("doc_id").as("_id"),
        sort_array(Dedup.wordShingles(col("text"), 3)).as("_sh"))
      .filter(size(col("_sh")) > 0)
      .withColumn("_hs", graft.functions.VectorFunctions.polyHashAll(col("_sh")))
      .withColumn("_sig", Dedup.minHashSignature(col("_hs"), 16, 42L))
      .select(col("_id"), explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"), concat_ws(",",
          slice(col("_sig"), b * 4 + 1, 4).cast("array<string>")).as("bk"))
      }: _*)).as("_b"))
      .select(col("_id"), col("_b.band"), col("_b.bk"))
    val l = base.select(col("_id").as("ia"), col("band"), col("bk"))
    val r = base.select(col("_id").as("ib"), col("band"), col("bk"))
    val actual = l.join(r, Seq("band", "bk")).filter(col("ia") < col("ib"))
      .count()
    assert(predicted == actual)
  }

  // ---- simHashPairsPortable ----------------------------------------------

  test("portable simhash banding has exact recall vs brute-force hamming") {
    val banded = Dedup.simHashPairsPortable(docs, "text", "doc_id",
      maxDist = 2, chunks = 4, nBits = 48)
    // brute force over the same portable fingerprints
    val fp = docs.select(col("doc_id").as("_id"),
        array_distinct(filter(split(trim(col("text")), "\\s+"),
          t => length(t) > 0)).as("_tk"))
      .filter(size(col("_tk")) > 0)
      .select(col("_id"), graft.functions.VectorFunctions.simHashPoly(
        graft.functions.VectorFunctions.polyHashAll(col("_tk")),
        48, 77L).as("_fp"))
    val fa = fp.select(col("_id").as("doc_a"), col("_fp").as("_fpa"))
    val fb = fp.select(col("_id").as("doc_b"), col("_fp").as("_fpb"))
    val brute = fa.crossJoin(fb)
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("_fpa").bitwiseXOR(col("_fpb"))).as("hamming"))
      .filter(col("hamming") <= 2)
    val b1 = banded.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getInt(2))).toSet
    val b2 = brute.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getInt(2))).toSet
    assert(b1 == b2)
    assert(b1.nonEmpty, "fixture corpus should contain near-dup pairs")
  }

  test("portable simhash is a bag-of-words fingerprint: reordered tokens " +
      "pair at hamming 0, disjoint vocab does not pair") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "kappa iota theta eta zeta epsilon delta gamma beta alpha"),
      (3L, "entirely different vocabulary about quantum chromodynamics " +
        "lattice simulations and gauge theory")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simHashPairsPortable(fixture, "text", "doc_id",
      maxDist = 2, chunks = 4, nBits = 48)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.contains((1L, 2L, 0)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  // ---- lineDedupGlobal ---------------------------------------------------

  test("global line dedup removes corpus-frequent lines, keeps order, " +
      "empties, and sub-threshold lines") {
    import spark.implicits._
    val boiler = "accept our cookies to continue"
    val fixture = Seq(
      (1L, s"unique opening line\n$boiler\nbody of doc one"),
      (2L, s"$boiler\n\n  body of doc two  "),
      (3L, s"body of doc three\n  $boiler  "),
      (4L, "shared twice only\nbody of doc four"),
      (5L, "shared twice only\nbody of doc five"),
      (6L, boiler)
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedupGlobal(fixture, "text", "doc_id",
        minDocFreq = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // boilerplate (3 docs, matched after trim) vanishes everywhere
    assert(out(1L) == "unique opening line\nbody of doc one")
    assert(out(2L) == "\n  body of doc two  ")   // empty line survives
    assert(out(3L) == "body of doc three")       // trailing variant matched
    // df = 2 < minDocFreq: kept
    assert(out(4L) == "shared twice only\nbody of doc four")
    assert(out(5L) == "shared twice only\nbody of doc five")
    assert(out(6L) == "")                        // fully-boilerplate doc stays
  }

  // ---- gramOverlapScores -------------------------------------------------

  test("gram overlap: verbatim eval doc scores 1.0, novel scores 0.0, " +
      "partial overlap is the exact gram fraction") {
    import spark.implicits._
    val train = Seq(
      (1L, "the cat sat on the mat today"),
      (2L, "dogs chase cats around the yard")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "the cat sat on the mat today"),       // verbatim copy
      (11L, "quantum lattice gauge theory papers"),// fully novel
      (12L, "the cat sat on a hat") // shares "the cat sat", "cat sat on"
    ).toDF("doc_id", "text")
    val out = Dedup.gramOverlapScores(train, eval, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(10L) == ((5L, 5L, 1.0)))
    assert(out(11L) == ((3L, 0L, 0.0)))
    assert(out(12L) == ((4L, 2L, 0.5)))
  }

  // ---- perplexityBuckets -------------------------------------------------

  test("perplexity buckets: exact per-domain terciles, best-first, " +
      "nulls sink to tail") {
    import spark.implicits._
    val scored = ((1 to 10).map(i =>
        (i.toLong, "en", Some(i * 100.0))) ++ Seq(
        (21L, "fr", Some(500.0)), (22L, "fr", Some(400.0)),
        (23L, "fr", None))) // unscoreable doc
      .toDF("id", "dom", "score")
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val out = graft.ext.TextAnalysis.perplexityBuckets(
        scored, "id", "dom", "score", headFrac = 0.1, midFrac = 0.3)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // en: 10 docs ranked 1000..100 → head = ceil(1) = rank 1 (id 10),
    // middle = ranks 2-4 (ids 9,8,7), tail = the rest
    assert(out(10L) == "head")
    assert(Seq(9L, 8L, 7L).forall(out(_) == "middle"))
    assert(Seq(6L, 5L, 4L, 3L, 2L, 1L).forall(out(_) == "tail"))
    // fr: 3 docs → head = ceil(0.3) = rank 1, middle = rank 2 (ceil(1.2)),
    // null score ranks last → tail
    assert(out(21L) == "head")
    assert(out(22L) == "middle")
    assert(out(23L) == "tail")
    // round-7 contract: the op materializes via a repartition barrier,
    // never a localCheckpoint — a lazily-returned DataFrame could not
    // release one, pinning executor blocks for the session's lifetime.
    // "No NEW pinned storage" rather than a global isEmpty: suites
    // share the session and run in parallel, so another suite's
    // in-flight checkpoint may be visible here (JsonSourceSpec
    // documents the same pattern).
    assert(spark.sparkContext.getPersistentRDDs.keySet
        .subsetOf(pinnedBefore),
      "perplexityBuckets must not pin persistent RDD blocks")
  }

  // ---- ccnetCurate -------------------------------------------------------

  test("ccnet pipeline keeps exactly the per-language head+middle of the " +
      "cleaned-text ranking") {
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val out = graft.ext.Curation.ccnetCurate(docs, "text", "doc_id", "lang")
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => Set("head", "middle").contains(r.getString(2))))
    val survivors = out.groupBy(_.getString(1)).view.mapValues(_.length)
    val totals = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (lang, n) =>
      val expect = math.ceil(0.4 * n).toLong
      assert(survivors.getOrElse(lang, 0) == expect,
        s"lang $lang: ${survivors.getOrElse(lang, 0)} of $n, want $expect")
    }
    // round-7 contract: the pipeline materializes intermediates via
    // repartition barriers, never localCheckpoints it cannot release
    // ("no NEW pinned storage" — parallel suites share the session)
    assert(spark.sparkContext.getPersistentRDDs.keySet
        .subsetOf(pinnedBefore),
      "ccnetCurate must not pin persistent RDD blocks")
  }

  test("line dedup and ccnet pipeline keep fully-boilerplate docs " +
      "(empty clean_text, ranked at the tail within the full population)") {
    import spark.implicits._
    // 3 exact-duplicate docs: every line is boilerplate, nothing
    // survives — the doc must still emit (clean_text = '') and still
    // count toward the per-language population n (dropping it would
    // shift the tercile boundaries for every other doc). Verified
    // equal to the q140/q144 oracles' LEFT JOIN + coalesce replay on
    // this exact input.
    val d = Seq((1L, "buy now", "en"), (2L, "buy now", "en"),
        (3L, "buy now", "en"), (4L, "hello world\nbuy now", "en"))
      .toDF("doc_id", "text", "lang")
    val cleaned = Dedup.lineDedupGlobal(d, "text", "doc_id", minDocFreq = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned == Map(1L -> "", 2L -> "", 3L -> "",
      4L -> "hello world"))
    val kept = graft.ext.Curation.ccnetCurate(d, "text", "doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // n=4: head = ceil(0.4) = rank 1 (doc 4, the only scoreable doc),
    // middle = rank 2 (doc 1 — unscoreable docs tie at the bottom,
    // doc_id ascending)
    assert(kept == Map(4L -> "head", 1L -> "middle"))
  }

  // ---- Bpe.train ---------------------------------------------------------

  test("bpe training: greedy run merging, frequency-weighted counts, " +
      "early exhaustion") {
    import spark.implicits._
    val corpus = Seq((1L, "aaaa aaaa bb")).toDF("doc_id", "text")
    val merges = graft.ext.Bpe.train(corpus, "text", k = 5)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // "aaaa"x2: greedy (a,a) merges at offsets 0 and 2 => 3 pairs/word;
    // after round 1 both words are [aa,aa]; round 3 consumes "bb";
    // nothing mergeable remains => 3 of the requested 5 rounds
    assert(merges.toSeq == Seq(
      (1, "a", "a", 6L), (2, "aa", "aa", 2L), (3, "b", "b", 1L)))
  }

  test("bpe training breaks count ties lexicographically") {
    import spark.implicits._
    val corpus = Seq((1L, "cd ab cd ab")).toDF("doc_id", "text")
    val merges = graft.ext.Bpe.train(corpus, "text", k = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(merges.toSeq == Seq((1, "a", "b"), (2, "c", "d")))
  }

  test("bpe incremental pair maintenance replays the full-recount merge " +
      "list on a mixed corpus") {
    import spark.implicits._
    // overlapping runs, ties, shared symbols across words — the cases
    // where a wrong pair delta would surface as a diverging argmax
    val corpus = Seq((1L, "abab abab banana bandana"),
      (2L, "ananas banana abab aa aab")).toDF("doc_id", "text")
    val merges = graft.ext.Bpe.train(corpus, "text", k = 6)
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    // reference: the pre-round-7 full recount, replayed per round over
    // the evolving word table
    var words = corpus
      .select(explode(graft.ext.TextAnalysis.tokens(col("text"))).as("_w"))
      .groupBy(col("_w")).agg(count(lit(1)).as("_n"))
      .select(graft.ext.Bpe.codePointSyms(col("_w")).as("_sym"), col("_n"))
    val expect = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Long)]
    for (_ <- 1 to 6) {
      val top = graft.ext.Bpe.fullPairCounts(words)
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.nonEmpty) {
        val (l, r, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        expect += ((l, r, c))
        words = words.select(graft.functions.VectorFunctions.bpeMerge(
          col("_sym"), lit(l), lit(r)).as("_sym"), col("_n"))
      }
    }
    assert(merges.toSeq == expect.toSeq)
  }

  test("bpe splits words into code points: surrogate pairs stay whole") {
    import spark.implicits._
    // 😀 = U+1F600 (two UTF-16 code units); a code-unit split would
    // produce invalid half-symbols and a garbage merge list
    val corpus = Seq((1L, "😀😀 " +
      "😀😀")).toDF("doc_id", "text")
    val merges = graft.ext.Bpe.train(corpus, "text", k = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(merges.toSeq == Seq((1, "😀", "😀", 2L)))
    val counts = graft.ext.Bpe.encodeTokenCounts(corpus, "text", "doc_id",
        Seq(("😀", "😀")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 2L))
  }

  test("bpe affected-word predicate matches exactly the words with the " +
      "pair adjacent") {
    import spark.implicits._
    val words = Seq("abab", "ba", "aab", "b", "xaby")
      .toDF("_w")
      .select(graft.ext.Bpe.codePointSyms(col("_w")).as("_sym"),
        col("_w"))
    val hit = words
      .filter(graft.ext.Bpe.hasPair(col("_sym"), "a", "b"))
      .collect().map(_.getString(1)).toSet
    assert(hit == Set("abab", "aab", "xaby"))
  }

  test("bpe encode counts tokens under the learned merges") {
    import spark.implicits._
    val corpus = Seq((1L, "aaaa aaaa bb"), (2L, "aaaa b")).toDF("doc_id", "text")
    val merges = graft.ext.Bpe.train(corpus, "text", k = 8)
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val out = graft.ext.Bpe.encodeTokenCounts(corpus, "text", "doc_id",
        merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // merges collapse "aaaa" -> [aaaa] and "bb" -> [bb]; "b" stays [b]
    assert(out == Map(1L -> 3L, 2L -> 2L))
  }

  // ---- spanCorrupt -------------------------------------------------------

  test("span corruption round-trips: substituting targets' spans into the " +
      "input restores the original token stream") {
    val out = graft.ext.TextAnalysis.spanCorrupt(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    val orig = docs.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").trim.split("\\s+").filter(_.nonEmpty).toSeq)
      .toMap
    assert(out.keySet == orig.keySet)
    var masked = 0L
    var total = 0L
    orig.foreach { case (id, toks) =>
      val (inp, tgt) = out(id)
      val spans = tgt.split("<extra_id_\\d+>").toSeq.drop(1)
        .map(_.trim.split(" ").filter(_.nonEmpty).toSeq)
      val restored = inp.split(" ").filter(_.nonEmpty).toSeq.flatMap { t =>
        if (t.matches("<extra_id_\\d+>"))
          spans(t.stripPrefix("<extra_id_").stripSuffix(">").toInt)
        else Seq(t)
      }
      assert(restored == toks, s"doc $id failed to round-trip")
      masked += spans.map(_.size).sum
      total += toks.size
    }
    // Knuth-hash selection should land near the 15% target rate
    val rate = masked.toDouble / total
    assert(rate > 0.10 && rate < 0.20, s"mask rate $rate out of band")
  }

  // ---- oovRate -----------------------------------------------------------

  test("oov rate under a pinned top-N vocabulary, lexicographic tie at " +
      "the boundary") {
    import spark.implicits._
    // counts: a=3, b=2, c=2, d=1 — top-2 keeps a and b (tie b/c at 2
    // broken lexicographically)
    val corpus = Seq(
      (1L, "a a b c"), (2L, "a b c d")).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.oovRate(corpus, "text", "doc_id",
        vocabSize = 2)
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((4L, 1L, 0.25)))   // c is OOV
    assert(out(2L) == ((4L, 2L, 0.5)))    // c, d are OOV
  }

  // ---- datasetCard -------------------------------------------------------

  test("dataset card: exact per-domain docs/tokens/dups/short counts") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "en", "one two three four five six seven eight nine ten"),
      (2L, "en", "ONE  two three four five six seven eight nine ten"),
      (3L, "en", "tiny doc"),
      (4L, "fr", "un deux trois")
    ).toDF("doc_id", "lang", "text")
    val out = graft.ext.TextAnalysis.datasetCard(fixture, "text", "doc_id",
        "lang")
      .collect().map(r => r.getString(0) -> r).toMap
    val en = out("en")
    assert(en.getLong(1) == 3)            // n_docs
    assert(en.getLong(2) == 22)           // 10 + 10 + 2 tokens
    // docs 1/2 collapse under the normalized (lower, ws-squashed) key
    assert(en.getLong(4) == 1)            // n_dups
    assert(en.getLong(5) == 1)            // n_short (doc 3)
    assert(en.getDouble(6) == 22.0 / 3)
    val fr = out("fr")
    assert(fr.getLong(1) == 1 && fr.getLong(4) == 0 && fr.getLong(5) == 1)
  }

  // ---- pageRankFixedPoint ------------------------------------------------

  test("fixed-point pagerank reproduces the hand-computed exact trajectory") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("s", "d")
    val out = graft.ext.GraphOps.pageRankFixedPoint(edges, "s", "d",
        iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // base = 150000; it1: r=(150000, 575000, 1425000); it2 below
    assert(out == Map(
      1L -> 150000L,
      2L -> 213750L,   // 150000 + floor(150000*0.85/2 micro)
      3L -> 702500L))  // 150000 + 63750 + floor(575000*0.85 micro)
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  test("pagerank survives hub ranks past the Long product bound " +
      "(decimal intermediates), warm-started from a stored fixed point") {
    import spark.implicits._
    // a hub at rank_micro 1.105e13 (what a 13M-in-degree domain
    // reaches at default damping) has a damped product over Long.Max:
    // Long arithmetic would wrap silently to a wrong downstream rank,
    // the decimal intermediates must floor the exact value. Warm
    // start stands in for the giant star that would produce the rank
    // (and pins the resume-from-stored-ranks path itself).
    val edges = Seq((0L, 1L)).toDF("s", "d")
    val init = Seq((0L, 11050000150000L)).toDF("node", "rank_micro")
    val out = graft.ext.GraphOps.pageRankFixedPoint(edges, "s", "d",
        iters = 1, initRanks = Some(init))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // sink = 150000 + floor(11_050_000_150_000 · 0.85)
    assert(out == Map(0L -> 150000L, 1L -> 9392500277500L))
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  // ---- pqEncodeResidual --------------------------------------------------

  test("residual encode == plain PQ encode over explicitly-computed residuals") {
    val cents = Similarity.coarseCentroids(emb, "vec_id", "embedding", 8)
    val cb = Similarity.cellResiduals(
        emb.filter(col("vec_id") >= 8 && col("vec_id") < 24),
        "vec_id", "embedding", cents)
      .select((col("_id") - 8).cast("long").as("_cb"), col("_rv").as("_cv"))
    val viaOp = Similarity.pqEncodeResidual(emb, "vec_id", "embedding",
      cb, cents)
      .select(col("_id"), concat_ws(",", col("codes").cast("array<string>")).as("codes"), col("err"))
    val residuals = Similarity.cellResiduals(emb, "vec_id", "embedding", cents)
    val viaCompose = Similarity.pqEncodeWith(residuals, "_id", "_rv", cb)
      .select(col("_id"), concat_ws(",", col("codes").cast("array<string>")).as("codes"), col("err"))
    val a = viaOp.collect().map(_.mkString("|")).toSet
    val b = viaCompose.collect().map(_.mkString("|")).toSet
    assert(a == b)
  }

  test("residual ADC probe ranks == direct reconstruction-distance ranks") {
    import org.apache.spark.sql.expressions.Window
    val cents = Similarity.coarseCentroids(emb, "vec_id", "embedding", 8)
    val cb = Similarity.cellResiduals(
        emb.filter(col("vec_id") >= 8 && col("vec_id") < 24),
        "vec_id", "embedding", cents)
      .select((col("_id") - 8).cast("long").as("_cb"), col("_rv").as("_cv"))
    val queries = emb.filter(col("vec_id") < 20)
    val viaOp = Similarity.ivfPqResidualTopKWith(queries, emb,
      "vec_id", "embedding", k = 3, cb, nCells = 8, nProbe = 2)
    // reference: ADC(q, n) over codes == L2²(q_residual, recon_n) when
    // summed with the same per-subspace association — the defining
    // identity of the asymmetric-distance table
    val enc = Similarity.pqEncodeWith(
      Similarity.cellResiduals(emb, "vec_id", "embedding", cents),
      "_id", "_rv", cb, passthrough = Seq("cell"))
      .select(col("_id").as("n_id"), col("cell").as("_cell"), col("recon"))
    val probes = queries
      .select(col("vec_id").as("q_id"),
        col("embedding").cast("array<double>").as("_qv"))
      .crossJoin(broadcast(cents.withColumn("_centn2",
        graft.functions.VectorFunctions.dot(col("_centv"), col("_centv")))))
      .withColumn("_csim",
        graft.functions.VectorFunctions.dot(col("_qv"), col("_centv")) /
          sqrt(graft.functions.VectorFunctions.dot(col("_qv"), col("_qv")) *
            col("_centn2")))
      .withColumn("_pr", row_number().over(Window.partitionBy(col("q_id"))
        .orderBy(col("_csim").desc, col("cent_id").asc)))
      .filter(col("_pr") <= 2)
      .select(col("q_id"), col("cent_id").cast("long").as("_cell"),
        zip_with(col("_qv"), col("_centv").cast("array<double>"),
          (a, b) => a - b).as("_qrv"))
    val ref = probes.join(enc, Seq("_cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("dist", (0 until 8).foldLeft(lit(0.0))((acc, j) =>
        acc + graft.functions.VectorFunctions.subspaceL2(
          col("_qrv"), col("recon"), j * 8, 8)))
      .withColumn("rank", row_number().over(Window.partitionBy(col("q_id"))
        .orderBy(col("dist").asc, col("n_id").asc)))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("n_id"), col("rank"))
    val a = viaOp.collect().map(_.mkString("|")).toSet
    val b = ref.collect().map(_.mkString("|")).toSet
    assert(a == b)
    assert(a.size == 20 * 3)
  }

  test("residual ADC probe errors loudly on a codebook that lost a cell") {
    val cents = Similarity.coarseCentroids(emb, "vec_id", "embedding", 8)
    // 15 rows where the positional ADC layout requires exactly 16 —
    // the guard must raise, never silently shift every block
    val cbShort = Similarity.cellResiduals(
        emb.filter(col("vec_id") >= 8 && col("vec_id") < 23),
        "vec_id", "embedding", cents)
      .select((col("_id") - 8).cast("long").as("_cb"), col("_rv").as("_cv"))
    val ex = intercept[Throwable] {
      Similarity.ivfPqResidualTopKWith(
        emb.filter(col("vec_id") < 4), emb, "vec_id", "embedding",
        k = 3, cbShort, nCells = 8, nProbe = 2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains(
        "codebook must have exactly 16 rows")),
      s"unexpected failure: ${messages(ex).mkString(" | ")}")
  }

  test("codebook-source vectors encode to their own codeword with zero error") {
    val cents = Similarity.coarseCentroids(emb, "vec_id", "embedding", 8)
    val cb = Similarity.cellResiduals(
        emb.filter(col("vec_id") >= 8 && col("vec_id") < 24),
        "vec_id", "embedding", cents)
      .select((col("_id") - 8).cast("long").as("_cb"), col("_rv").as("_cv"))
    val own = Similarity.pqEncodeResidual(emb, "vec_id", "embedding",
        cb, cents)
      .filter(col("_id") >= 8 && col("_id") < 24)
      .collect()
    assert(own.length == 16)
    own.foreach { r =>
      val id = r.getLong(0)
      val codes = r.getSeq[Int](2)
      assert(codes.forall(_ == (id - 8).toInt),
        s"vec $id should self-encode, got $codes")
      assert(r.getDouble(3) == 0.0, s"vec $id err ${r.getDouble(3)}")
    }
  }
}

/** Physical-shape gates for the round-6 operators: the plans that make
  * them 100 TB-viable must not silently regress. */
class Round6PlanShapeSpec extends SparkSpec {
  import graft.queries.Catalog

  private def executed(df: DataFrame): String = {
    df.count()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  private def catalogPlan(name: String): String =
    executed(Catalog.all.find(_.name == name).get.fn(spark, sf()))

  test("q136 band stats: pure two-level aggregation — no join, " +
      "map-side combine present") {
    val plan = catalogPlan("q136_lsh_band_stats")
    assert(!plan.contains("Join"), s"histogram grew a join:\n$plan")
    assert(plan.contains("partial_"), s"no map-side combine:\n$plan")
  }

  test("q137 portable simhash: banded equi-join only — no cartesian, " +
      "fingerprint kernel in the scan projection") {
    val plan = catalogPlan("q137_simhash_portable")
    assert(!plan.contains("CartesianProduct"),
      s"pair join degenerated to a cartesian:\n$plan")
    assert(plan.toLowerCase.contains("simhashpoly"),
      s"portable fingerprint kernel missing from the plan:\n$plan")
  }

  test("q139 residual probe: codes-only corpus side joins the broadcast " +
      "probe tables; corpus never hash-partitions on n_id") {
    val plan = catalogPlan("q139_ivfpq_residual")
    assert(plan.contains("BroadcastHashJoin"),
      s"probe-table join not broadcast:\n$plan")
    assert(!plan.contains("hashpartitioning(n_id"),
      s"index side shuffled on n_id:\n$plan")
    assert(!plan.contains("windowspecdefinition(n_id"),
      s"per-vector window resurfaced in the encode:\n$plan")
  }

  test("q138 residual encode: the repartition barrier is the ONLY corpus " +
      "exchange — the encode aggregation reuses its partitioning") {
    val plan = catalogPlan("q138_pq_residual")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"expected exactly the _id repartition, got $exchanges exchanges:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
  }

  test("q140 line dedup: reassembly is a map-only array filter — no " +
      "collect_list regroup of document text, no window") {
    val plan = catalogPlan("q140_line_dedup")
    assert(!plan.contains("collect_list"),
      s"text regrouped via collect_list:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
    assert(plan.contains("collect_set"),
      s"per-doc boilerplate set aggregation missing:\n$plan")
  }
}
