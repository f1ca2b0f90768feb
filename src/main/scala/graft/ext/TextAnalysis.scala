package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, language-ID heuristic, quality scoring, document
  * fingerprinting. All pure Column expressions (higher-order functions,
  * no UDFs) so they vectorize per-row with no serialization wall and
  * scale embarrassingly parallel — no shuffle is introduced by any
  * function here.
  *
  * Every function is deterministic and engine-portable (the DuckDB
  * oracle replays the identical arithmetic).
  */
object TextAnalysis {

  /** Whitespace tokens with empties dropped (split of a trimmed empty
    * string yields [""] — filtered so empty docs count 0 tokens). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish regex tokenizer: letter runs, digit runs, single
    * punctuation marks. */
  val RegexTokenPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(RegexTokenPattern), lit(0)))

  /** Language-ID n-gram/stopword heuristic: ratio of English marker
    * tokens among all tokens. Buckets are deterministic; 'empty' guards
    * zero-token docs. */
  val EnMarkers = Seq("the", "a", "of", "and", "is")

  def langIdHeuristic(text: Column): Column = {
    val toks = tokens(text)
    val hits = size(filter(toks, t => t.isin(EnMarkers.map(lit): _*)))
    val n = size(toks)
    val ratio = hits * lit(1.0) / n
    when(n === 0, lit("empty"))
      .when(ratio >= 0.10, lit("en"))
      .when(ratio >= 0.05, lit("en_like"))
      .otherwise(lit("other"))
  }

  /** Raw-HTML → visible text (the crawl front-end every pretraining
    * pipeline runs before any other text operator — CCNet trains its
    * LM on tag-stripped text, RefinedWeb's trafilatura stage plays the
    * same role): drop script/style/comment blocks, convert block-level
    * closes and `<br>` to line breaks, strip remaining tags, decode
    * the six common entities (`&amp;` last so double-escapes survive
    * one level). Script and style run as separate lazy-dotall passes —
    * no backreferences, so the identical pattern replays on RE2-family
    * engines. Pure codegen `regexp_replace`/`replace` chain: map-only,
    * embarrassingly parallel, no shuffle. */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script[^>]*>.*?</script\\s*>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style\\s*>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val blocks = regexp_replace(noComment,
      "(?i)<br[^>]*>|</(p|div|li|ul|ol|tr|table|h[1-6]|title|blockquote" +
        "|nav|header|footer|section|article)\\s*>", "\n")
    val noTags = regexp_replace(blocks, "<[^>]*>", " ")
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
  }

  /** Line-quality boilerplate removal over [[stripHtml]]'s output (the
    * RefinedWeb/CCNet line filter): split on line breaks, collapse
    * intra-line whitespace, drop empty lines, keep lines with ≥
    * `minLineWords` words — nav crumbs, titles, and footer fragments
    * fall below the bar while running prose survives. Returns
    * (_id, text = kept lines joined by newline, n_lines_raw,
    * n_lines_kept) — the doc-level extraction audit. Map-only. */
  def extractText(docs: DataFrame, htmlCol: String, idCol: String,
      minLineWords: Int = 3): DataFrame = {
    val lines = filter(
      transform(split(stripHtml(col(htmlCol)), "\n"),
        l => trim(regexp_replace(l, "\\s+", " "))),
      l => length(l) > 0)
    val kept = filter(lines, l => size(split(l, " ")) >= minLineWords)
    docs.select(col(idCol).as("_id"),
      array_join(kept, "\n").as("text"),
      size(lines).as("n_lines_raw"),
      size(kept).as("n_lines_kept"))
  }

  /** Quality metrics: token count, char count, non-whitespace chars,
    * mean token length, and a composite score — all integer-derived
    * double arithmetic (bit-reproducible across engines). */
  def nonWsChars(text: Column): Column =
    length(regexp_replace(text, "\\s", ""))

  def meanTokenLen(text: Column): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0.0)).otherwise(nonWsChars(text) * lit(1.0) / n)
  }

  def qualityScore(text: Column): Column = {
    val n = tokenCount(text)
    val len = length(text)
    val inkRatio = when(len === 0, lit(0.0))
      .otherwise(nonWsChars(text) * lit(1.0) / len)
    val sizeNorm = least(n, lit(200)) * lit(1.0) / lit(200.0)
    inkRatio * sizeNorm
  }

  /** Gopher-style document quality gate (Rae et al. 2021, appendix A
    * — the rule set RefinedWeb/Dolma reimplement): per-doc repetition
    * and format signals plus the published keep conjunction. Every
    * signal is an integer-count-derived ratio, so an external engine
    * replays each value bit-exactly; the whole gate is array
    * expressions over split results — MAP-ONLY, zero shuffle, the
    * 100 TB shape being one codegen'd corpus scan.
    *
    * Signals: n_words; mean_word_len; frac_alpha_words (words
    * containing a letter); n_stop_hits (distinct members of the
    * pinned 8-stopword list present, lowercased); frac_bullet_lines /
    * frac_ellipsis_lines (over trimmed non-empty lines);
    * dup_line_frac (1 − distinct/total lines); symbol_word_ratio
    * ('#' plus '...' occurrences per word). `keep` is the Gopher
    * gate: 50 ≤ n_words ≤ 100000, 3 ≤ mean_word_len ≤ 10,
    * symbol_word_ratio < 0.1, frac_bullet_lines < 0.9,
    * frac_ellipsis_lines < 0.3, frac_alpha_words ≥ 0.8,
    * n_stop_hits ≥ 2, dup_line_frac < 0.3. */
  /** The Gopher signal set of a text column, as named Columns —
    * shared by [[gopherQualityFlags]] (the per-signal dashboard) and
    * [[gopherKeep]] (the bare gate predicate for map-only filter
    * composition, e.g. the streaming curation stage). */
  private def gopherSignals(text: Column): Seq[(String, Column)] = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have",
      "with")
    val ws = tokens(text)
    val lw = transform(ws, w => lower(w))
    val ls = filter(transform(split(text, "\n", -1),
      l => trim(l)), l => length(l) > 0)
    def ratio(num: Column, den: Column): Column =
      when(den === 0, lit(0.0)).otherwise(num * lit(1.0) / den)
    val nWords = size(ws)
    val nLines = size(ls)
    val meanLen = ratio(aggregate(transform(ws,
      w => length(w).cast("long")), lit(0L), (a, b) => a + b), nWords)
    val fracAlpha = ratio(
      size(filter(ws, w => w.rlike("[A-Za-z]"))), nWords)
    val stopHits = stops.map(s =>
      when(array_contains(lw, s), lit(1)).otherwise(lit(0)))
      .reduce(_ + _).cast("long")
    val fracBullet = ratio(size(filter(ls, l =>
      l.substr(lit(1), lit(1)).isin("-", "*", "\u2022"))), nLines)
    val fracEllipsis = ratio(size(filter(ls, l =>
      l.endsWith("...") || l.endsWith("\u2026"))), nLines)
    val dupLine = ratio(nLines - size(array_distinct(ls)), nLines)
    val nHash = length(text) -
      length(regexp_replace(text, "#", ""))
    val nEll = ((length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))) / 3)
      .cast("long")
    val symbolRatio = ratio(nHash + nEll, nWords)
    Seq("n_words" -> nWords.cast("long"),
      "mean_word_len" -> meanLen,
      "frac_alpha_words" -> fracAlpha,
      "n_stop_hits" -> stopHits,
      "frac_bullet_lines" -> fracBullet,
      "frac_ellipsis_lines" -> fracEllipsis,
      "dup_line_frac" -> dupLine,
      "symbol_word_ratio" -> symbolRatio)
  }

  /** The published Gopher keep conjunction as a bare Column predicate
    * over the signals — MAP-ONLY, so it composes into filters,
    * streams, and the foreachBatch curation stage unchanged. */
  def gopherKeep(text: Column): Column = {
    val sig = gopherSignals(text).toMap
    sig("n_words") >= 50 && sig("n_words") <= 100000 &&
      sig("mean_word_len") >= 3.0 && sig("mean_word_len") <= 10.0 &&
      sig("symbol_word_ratio") < 0.1 &&
      sig("frac_bullet_lines") < 0.9 &&
      sig("frac_ellipsis_lines") < 0.3 &&
      sig("frac_alpha_words") >= 0.8 &&
      sig("n_stop_hits") >= 2 &&
      sig("dup_line_frac") < 0.3
  }

  def gopherQualityFlags(docs: DataFrame, textCol: String,
      idCol: String): DataFrame =
    docs.select(col(idCol) +: gopherSignals(col(textCol)).map {
        case (n, c) => c.as(n) }: _*)
      .withColumn("keep",
        col("n_words") >= 50 && col("n_words") <= 100000 &&
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
        col("symbol_word_ratio") < 0.1 &&
        col("frac_bullet_lines") < 0.9 &&
        col("frac_ellipsis_lines") < 0.3 &&
        col("frac_alpha_words") >= 0.8 &&
        col("n_stop_hits") >= 2 &&
        col("dup_line_frac") < 0.3)

  /** C4-style page cleaning (Raffel et al. 2020 §2.2, the third of
    * the classic web-text recipes alongside Gopher ([[gopherKeep]])
    * and CCNet ([[Dedup.lineDedupGlobal]] + [[perplexityBuckets]])):
    * line rules keep only lines that end in terminal punctuation,
    * carry ≥ `minLineWords` single-space-separated words, and do not
    * mention "javascript"; page rules then drop any doc containing
    * "lorem ipsum", a curly bracket, or a `badWords` hit (C4's
    * configurable blocklist — word-boundary regex over the RAW page,
    * like the paper), or whose CLEANED text has fewer than
    * `minSentences` terminal punctuation marks (the paper counts
    * sentences on the retained text).
    *
    * Emits one row per input doc — `keep` marks the survivors and the
    * counters say which rule bit — so the dashboard shows rule yields
    * without a second pass.
    *
    * Scale shape: MAP-ONLY — every rule is a codegen'd Column
    * expression over split/filter/array_join higher-order functions;
    * no explode, no shuffle, stream-safe. At 100 TB this is one scan,
    * embarrassingly parallel. */
  def c4Clean(docs: DataFrame, textCol: String, idCol: String,
      minLineWords: Int = 3, minSentences: Int = 5,
      badWords: Seq[String] = Nil): DataFrame = {
    require(minLineWords >= 1 && minSentences >= 0)
    require(badWords.forall(
        _.matches("[A-Za-z0-9](?:[A-Za-z0-9']*[A-Za-z0-9])?")),
      "badWords must be plain words with word characters at both ends " +
        "— they are spliced into a \\b-anchored regex, and \\b next to " +
        "an edge apostrophe can never match standalone text")
    def wordCount(l: Column): Column =
      size(filter(split(l, " "), w => length(w) > 0))
    val kept = filter(split(col(textCol), "\n"), l =>
      l.rlike("[.!?\"]\\s*$") &&
        wordCount(l) >= minLineWords &&
        !lower(l).contains("javascript"))
    val clean = array_join(kept, "\n")
    // sentence count = terminal marks in the CLEANED text (length
    // difference, not a regex extract — identical in any engine)
    val nSent = length(col("_clean")) -
      length(regexp_replace(col("_clean"), "[.!?]", ""))
    val badHit: Column = badWords match {
      case Nil => lit(false)
      case ws => lower(col(textCol))
        .rlike("\\b(" + ws.map(_.toLowerCase).mkString("|") + ")\\b")
    }
    docs.select(col(idCol), col(textCol), kept.as("_kept"),
        clean.as("_clean"))
      .select(col(idCol), col("_clean").as("clean_text"),
        size(col("_kept")).as("n_lines_kept"),
        (size(split(col(textCol), "\n")) - size(col("_kept")))
          .as("n_lines_dropped"),
        nSent.as("n_sentences"),
        (!lower(col(textCol)).contains("lorem ipsum") &&
          !col(textCol).contains("{") && !col(textCol).contains("}") &&
          !badHit && nSent >= minSentences).as("keep"))
  }

  /** Top word-n-gram repetition (the remaining Gopher repetition
    * family, Rae et al. 2021 A1.1: "fraction of characters in the
    * most common n-gram"): per doc and per n, the most frequent
    * space-joined word n-gram (ties → lexicographically smallest),
    * its count, and the fraction of the doc's non-whitespace
    * characters its occurrences cover (count × the gram's non-space
    * length / total non-ws chars).
    *
    * MAP-ONLY per doc — no explode/groupBy shuffle: grams sort with
    * `sort_array` and a single `aggregate` fold walks the sorted runs
    * (state = current run + best-so-far; ascending order means a
    * strictly-greater-count update keeps the smallest gram on ties),
    * so the corpus pays one codegen'd scan at any scale. The oracle
    * replays via the conventional unnest + GROUP BY argmax — two
    * different computation paths pinning the same value. */
  def topNgramStats(docs: DataFrame, textCol: String, idCol: String,
      ns: Seq[Int] = Seq(2, 3)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1))
    val ws = tokens(col(textCol))
    val denom = nonWsChars(col(textCol))
    val init = struct(lit("").as("cur"), lit(0L).as("cnt"),
      lit("").as("bg"), lit(0L).as("bc"))
    def best(n: Int): Column = {
      val grams = when(size(ws) >= n,
        transform(sequence(lit(0), size(ws) - n), i =>
          concat_ws(" ", slice(ws, i + 1, lit(n)))))
        .otherwise(expr("array()").cast("array<string>"))
      val folded = aggregate(sort_array(grams), init,
        (st, g) => {
          val run = when(g === st.getField("cur"),
            st.getField("cnt") + 1).otherwise(lit(1L))
          struct(g.as("cur"), run.as("cnt"),
            when(run > st.getField("bc"), g)
              .otherwise(st.getField("bg")).as("bg"),
            when(run > st.getField("bc"), run)
              .otherwise(st.getField("bc")).as("bc"))
        })
      struct(folded.getField("bg").as("gram"),
        folded.getField("bc").as("cnt"))
    }
    val cols = ns.flatMap { n =>
      val b = best(n)
      val cnt = b.getField("cnt")
      val gram = b.getField("gram")
      val gramChars = when(cnt > 0,
        (length(gram) - (n - 1)).cast("long")).otherwise(lit(0L))
      Seq(gram.as(s"top${n}_gram"), cnt.as(s"top${n}_cnt"),
        when(denom === 0 || cnt === 0, lit(0.0))
          .otherwise(cnt * gramChars * lit(1.0) / denom)
          .as(s"top${n}_char_frac"))
    }
    docs.select(col(idCol) +: cols: _*)
  }

  /** PII redaction — the scrub pass every released training corpus
    * runs (CCNet/RedPajama-style): emails, IPv4 literals, and long
    * digit runs (phone-shaped) become pinned placeholder tokens, with
    * per-doc match counts for the removal audit. Map-only (three
    * chained regexp_replace over the scan — zero shuffle). The
    * patterns are deliberately restricted to the
    * backreference/lookaround-free subset where Java's leftmost-first
    * greedy matching and RE2's leftmost-longest agree, so an external
    * engine replays the exact redacted text; counts are taken BEFORE
    * replacement, and the replacement order (email → IP → digit run)
    * is pinned — placeholders contain no digits or '@', so later
    * passes never re-match earlier output. */
  def piiRedact(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val digits = "\\b\\d{7,}\\b"
    def count(c: Column, pat: String): Column =
      size(regexp_extract_all(c, lit(pat), lit(0))).cast("long")
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, email, "<EMAIL>")
    val t2 = regexp_replace(t1, ipv4, "<IP>")
    val t3 = regexp_replace(t2, digits, "<NUM>")
    docs.select(col(idCol), t3.as("clean_text"),
      count(t0, email).as("n_emails"),
      count(t1, ipv4).as("n_ips"),
      count(t2, digits).as("n_phones"))
  }

  /** Rolling polynomial fingerprint over characters, mod 1e9+7:
    * fp = fold(codes, 0, (acc, c) => (acc*31 + c) mod p).
    *
    * Characters come from split(text, '') — one O(len) pass. The
    * earlier substr(i, 1)-per-index formulation was O(len²): UTF8
    * substr re-seeks from the string head for every position, which
    * at ~500-char docs made the fingerprint the whole cost of the
    * blocklist pipeline. split yields a trailing "" under Java's
    * limit=-1 semantics, filtered out so the fold sees exactly the
    * character sequence (same value as the indexed form and the
    * per-char oracle). */
  val FpMod = 1000000007L

  def fingerprint(text: Column): Column = {
    val codes = transform(
      filter(split(text, ""), c => length(c) > 0),
      c => ascii(c).cast("long"))
    when(length(text) === 0 || text.isNull, lit(0L))
      .otherwise(aggregate(codes, lit(0L),
        (acc, c) => (acc * lit(31L) + c) % lit(FpMod)))
  }

  /** BM25 relevance scores for a fixed query-term set — the retrieval
    * ranking a curation/dedup pipeline uses to pull topical slices.
    * All corpus statistics (document frequency, average length) are
    * computed in-plan; the df and length sides are term/scalar-tiny
    * and broadcast, so the corpus pays one tokenize pass plus one
    * (doc, term) aggregation.
    *
    * Oracle-exact by construction: idf is the q68-style integer
    * rational floor(1e6·(N−df+0.5)/(df+0.5)) (ln() differs across libm
    * builds and would break cross-engine hashing; BM25's ranking is
    * monotone in the rational, so ranks are preserved), the k1/b terms
    * evaluate in one pinned double expression, and the per-document
    * term sum folds in ascending term order. */
  /** Count-min sketch of the corpus token stream with ENGINE-PORTABLE
    * hashes: `d` rows × `w` columns, cell(j, c) = Σ occurrences of
    * tokens t with ((a_j·poly(t) + b_j) mod P) mod w = c — poly is the
    * rolling polynomial fingerprint, (a_j, b_j) the public seeded
    * permutation literals, so an external engine replays every cell.
    *
    * THE bounded-memory frequency structure at 100 TB: the build is
    * one map-side-combinable aggregation whose state is ≤ d·w cells
    * per partition regardless of corpus size (vs groupBy(token) whose
    * key space grows with the vocabulary), and the merged sketch is
    * d·w longs — broadcastable for downstream estimate probes. */
  def countMinCells(docs: DataFrame, textCol: String, d: Int = 4,
      w: Int = 512, seed: Long = 11L): DataFrame = {
    require(d > 0 && w > 0)
    val (as, bs) = graft.functions.MinHashSig.perms(d, seed)
    docs.select(explode(tokens(col(textCol))).as("_t"))
      .withColumn("_hv", element_at(
        graft.functions.VectorFunctions.polyHashAll(array(col("_t"))), 1))
      .select(explode(array((0 until d).map(j =>
        struct(lit(j).as("row"),
          pmod(pmod(col("_hv") * lit(as(j)) + lit(bs(j)),
            lit(graft.functions.MinHashSig.P)), lit(w.toLong))
            .as("col"))): _*)).as("_rc"))
      .groupBy(col("_rc").getField("row").as("row"),
        col("_rc").getField("col").as("col"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Heavy-hitter estimates from [[countMinCells]]: for every token
    * with exact count ≥ `minCount`, the CMS estimate min_j cell(j,
    * h_j(t)) — ≥ the true count by construction (collisions only
    * inflate), equal when no row collides. Returns (tok, n_exact,
    * cms_est); the exact side here is the audit baseline a production
    * run would skip (it would probe the broadcast sketch instead of
    * grouping the vocabulary). */
  def cmsHeavyHitters(docs: DataFrame, textCol: String, minCount: Long,
      d: Int = 4, w: Int = 512, seed: Long = 11L): DataFrame = {
    val (as, bs) = graft.functions.MinHashSig.perms(d, seed)
    val cells = countMinCells(docs, textCol, d, w, seed)
    val exact = docs.select(explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
      .filter(col("n_exact") >= minCount)
    val probes = exact
      .withColumn("_hv", element_at(
        graft.functions.VectorFunctions.polyHashAll(array(col("tok"))), 1))
      .select(col("tok"), col("n_exact"), explode(array((0 until d).map(j =>
        struct(lit(j).as("row"),
          pmod(pmod(col("_hv") * lit(as(j)) + lit(bs(j)),
            lit(graft.functions.MinHashSig.P)), lit(w.toLong))
            .as("col"))): _*)).as("_rc"))
      .select(col("tok"), col("n_exact"),
        col("_rc").getField("row").as("row"),
        col("_rc").getField("col").as("col"))
    probes.join(broadcast(cells), Seq("row", "col"))
      .groupBy(col("tok"), col("n_exact"))
      .agg(min(col("cnt")).as("cms_est"))
  }

  def bm25Scores(docs: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty)
    val base = docs.select(col(idCol).as("_id"), tokens(col(textCol)).as("_tk"))
    val dl = base.select(col("_id"), size(col("_tk")).cast("long").as("_dl"))
    val stats = dl.agg(count(lit(1)).as("_nd"), sum(col("_dl")).as("_sd"))
    val tf = base.select(col("_id"), explode(col("_tk")).as("_t"))
      .filter(col("_t").isin(terms: _*))
      .groupBy(col("_id"), col("_t")).agg(count(lit(1)).as("_tf"))
    val dfs = tf.groupBy(col("_t")).agg(count(lit(1)).as("_df"))
    val scored = tf
      .join(broadcast(dfs), "_t")
      .join(dl, "_id")
      .crossJoin(broadcast(stats))
      .withColumn("_idf_micro",
        expr("((_nd - _df) * 2000000 + 1000000) div (2 * _df + 1)"))
      .withColumn("_s",
        col("_idf_micro").cast("double")
          * (col("_tf").cast("double") * lit(k1 + 1.0))
          / (col("_tf").cast("double") + lit(k1)
            * (lit(1.0) - lit(b) + lit(b)
              * (col("_dl").cast("double")
                / (col("_sd").cast("double") / col("_nd").cast("double"))))))
    scored.groupBy(col("_id"))
      .agg(aggregate(
        transform(sort_array(collect_list(struct(col("_t"), col("_s")))),
          s => s.getField("_s")),
        lit(0.0), (acc, x) => acc + x).as("bm25_micro"))
      .select(col("_id"), col("bm25_micro"))
  }

  /** Bigram language-model quality scores (CCNet-style perplexity
    * filtering, log-free): the corpus itself is the LM. Every adjacent
    * token pair is scored with the add-one-smoothed conditional
    * p(w₂|w₁) = (c(w₁,w₂) + 1) / (c(w₁·) + V) in exact integer
    * micro-units (⌊p·10⁶⌋) — no transcendental log, whose last-ulp
    * behavior differs across engines — summed per document. The
    * micro-mean is a monotone quality signal, so the tercile
    * head/middle/tail bucketing CCNet does on log-perplexity works
    * unchanged on it (q132).
    *
    * Counts: c(w₁,w₂) over all adjacent pairs corpus-wide; c(w₁·)
    * over bigram LEFT contexts (every token occurrence except each
    * document's last); V = distinct tokens corpus-wide.
    *
    * Scale shape: one token-level explode, two keyed count
    * aggregations (bigram, left context), two shuffle joins back on
    * those keys, one broadcast scalar (V), one per-doc aggregation —
    * all map-side combinable; no windows, no all-pairs, no driver
    * loop. Output columns: _id, n_bigrams, lm_micro_sum,
    * lm_mean_micro (null for docs with < 2 tokens). */
  /** Deterministic T5-style span corruption (Raffel et al., JMLR
    * 2020 §3.1.4 objective, BERT-style token selection): token i of
    * document d is masked iff the Knuth hash of (d·1000003 + i) lands
    * under `rateMicro`/1e6, and maximal masked runs collapse to
    * `<extra_id_k>` sentinels — input keeps the unmasked text with
    * sentinels, targets hold each sentinel's hidden tokens. Hash-based
    * selection instead of an RNG makes every example REPRODUCIBLE and
    * growth-stable (a document's corruption never changes when the
    * corpus does — the q130 hash-split property, which per-worker RNG
    * streams lack) and lets the oracle replay the exact masks (q149).
    * Run lengths follow the geometric distribution token-level masking
    * induces. Map-only: two codegen kernel renders per row, no
    * shuffle. Returns (idCol, input_text, targets). */
  def spanCorrupt(docs: DataFrame, textCol: String, idCol: String,
      rateMicro: Int = 150000): DataFrame = {
    val tk = tokens(col(textCol))
    val mask = transform(sequence(lit(1), size(col("_tk"))), i =>
      pmod(pmod(col(idCol) * lit(1000003L) + i.cast("long"),
        lit(2147483648L)) * lit(2654435761L), lit(2147483647L))
        % lit(1000000L) < lit(rateMicro.toLong))
    docs.select(col(idCol), tk.as("_tk"))
      .withColumn("_m", mask)
      .select(col(idCol),
        graft.functions.VectorFunctions
          .spanCorrupt(col("_tk"), col("_m"), targets = false)
          .as("input_text"),
        graft.functions.VectorFunctions
          .spanCorrupt(col("_tk"), col("_m"), targets = true)
          .as("targets"))
  }

  /** Tokenizer-coverage analysis: per-document out-of-vocabulary rate
    * under the corpus top-`vocabSize` token vocabulary (ties pinned:
    * count desc, then token lexicographic — so the vocabulary itself
    * is deterministic and the oracle replays it). The signal coverage
    * studies read before fixing a vocab size. Returns
    * (idCol, n_tokens, n_oov, oov_rate).
    *
    * Scale shape: the vocabulary is one map-combinable count
    * aggregation plus a bounded top-N sort (vocabSize rows); the probe
    * is a keyed left join of slim (doc, token) rows against the
    * (broadcast-size) vocabulary and one per-doc sum. */
  def oovRate(docs: DataFrame, textCol: String, idCol: String,
      vocabSize: Int = 1000): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("_t"))
    val vocab = toks.groupBy(col("_t")).agg(count(lit(1)).as("_c"))
      .orderBy(col("_c").desc, col("_t").asc).limit(vocabSize)
      .select(col("_t"), lit(1).as("_in"))
    toks.join(vocab, Seq("_t"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("_in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
  }

  /** Model-free document embeddings by signed random projection — the
    * SimHash idea kept DENSE: embedding[d] = Σ_tokens sign_d(h(token))
    * where h is the portable rolling-poly token hash (the q118 chain)
    * and sign_d flips on the parity of the d-th seeded affine
    * permutation (the [[graft.functions.MinHashSig.perms]] literals).
    * Sparse random projection preserves bag-of-words cosine in
    * expectation (Johnson–Lindenstrauss/Achlioptas; Charikar 2002 for
    * the sign form), so the output drops straight into the engine's
    * cosine/ANN family (q25/q27/q116) when no trained encoder exists
    * — the bootstrap embedding a curation pipeline starts with.
    * Every component is an exact Long sum, so the entire embedding
    * table hash-replays (q165); a learned float encoder could never
    * carry that oracle. Map-only until the single per-doc
    * aggregation; token strings never leave the scan. Token-less
    * docs produce no row (the tokens-join semantics). */
  def hashEmbed(docs: DataFrame, textCol: String, idCol: String,
      dim: Int = 16, seed: Long = 42L): DataFrame = {
    require(dim >= 1)
    val (as, bs) = graft.functions.MinHashSig.perms(dim, seed)
    val sums = (0 until dim).map { d =>
      // h < 2^31 and a_d < 2^31 keep a_d*h + b_d < 2^62 (the MinHash
      // overflow discipline); parity of the permuted value is an
      // unbiased ±1 that any engine replays
      sum(when(pmod(col("_h") * lit(as(d)) + lit(bs(d)),
        lit(2147483647L)) % 2 === 0, 1L).otherwise(-1L)).as(s"_e$d")
    }
    docs.select(col(idCol).as("doc_id"),
        explode(graft.functions.VectorFunctions.polyHashAll(
          tokens(col(textCol)))).as("_h"))
      .groupBy(col("doc_id"))
      .agg(sums.head, sums.tail: _*)
      .select(col("doc_id"),
        array((0 until dim).map(d => col(s"_e$d")): _*).as("embedding"))
  }

  /** Per-domain dataset card — the summary table every corpus release
    * publishes (docs, tokens, chars, exact-dup count under the
    * normalized key, short-doc count, mean length): one
    * map-side-combinable aggregation pass over the corpus, the
    * count-distinct being its only second shuffle. All counts are
    * exact integers and the mean is one Long/Long IEEE division, so
    * the card hash-replays (q146). */
  def datasetCard(docs: DataFrame, textCol: String, idCol: String,
      domainCol: String, shortDocTokens: Int = 10): DataFrame = {
    val text = col(textCol)
    docs.select(col(domainCol), tokenCount(text).cast("long").as("_tk"),
        length(text).cast("long").as("_ch"), Dedup.normKey(text).as("_nk"))
      .groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_tk")).as("n_tokens"),
        sum(col("_ch")).as("n_chars"),
        (count(lit(1)) - count_distinct(col("_nk"))).as("n_dups"),
        sum(when(col("_tk") < shortDocTokens, 1L).otherwise(0L))
          .as("n_short"))
      .withColumn("mean_tokens",
        col("n_tokens").cast("double") / col("n_docs").cast("double"))
  }

  /** CCNet head/middle/tail bucketing (Wenzek et al., LREC 2020 §4.3):
    * within each domain (CCNet: language), rank documents by LM
    * quality best-first and label the top `headFrac` "head", the next
    * `midFrac` "middle", the rest "tail" — the partition CCNet
    * publishes and downstream recipes sample from. Score is any
    * monotone quality signal ([[bigramLmScores]]' `lm_mean_micro`
    * here, higher = better); null scores (docs too short to score)
    * rank last. Returns (idCol, domainCol, bucket).
    *
    * Exact terciles need a per-domain total ordering, and a window
    * partitioned by domain alone would serialize a 50-of-100-TB
    * mega-domain into one task — so this uses the same two-phase
    * bucketed rank as `Sampling.mixtureSample`: local ranks within
    * (domain, score-range bucket) plus cumulative bucket counts
    * reconstruct the exact global rank; score ranges normalize by the
    * per-domain max (one tiny agg) so the buckets adapt to the score
    * scale. The offsets side is domains × nBuckets tiny rows,
    * broadcast back. Fractions should be "nice" decimals — they are
    * replayed literally by the oracle (q142). */
  def perplexityBuckets(scored: DataFrame, idCol: String,
      domainCol: String, scoreCol: String, headFrac: Double = 0.1,
      midFrac: Double = 0.3, nBuckets: Int = 256): DataFrame = {
    require(headFrac > 0 && midFrac > 0 && headFrac + midFrac < 1.0)
    // Materialize the slim scored projection ONCE behind a
    // repartition barrier: three consumers (the per-domain max, the
    // local-rank branch, the offsets branch) would otherwise each
    // re-evaluate the upstream scoring plan — for the bigram-LM
    // signal that is the full corpus-count chain per branch. The
    // barrier is an Exchange, so within the final single-action plan
    // ReuseExchange computes the map stage once and all three
    // branches re-read the shuffle files; the files are disk-backed
    // and auto-cleaned on GC. A localCheckpoint here (as before round
    // 7) pins corpus-sized executor blocks that a lazily-returned
    // DataFrame can never release — poison in a long-lived
    // multi-query session (the round-6 bench stall). Partitioned on
    // the id (even), NOT the domain — a 50-of-100-TB mega-domain
    // would serialize into one task; the (domain, _bkt) shuffles the
    // consumers need happen below regardless, exactly as they did
    // above the old cut.
    val slim = scored.select(col(idCol), col(domainCol),
      coalesce(col(scoreCol).cast("double"), lit(-1.0)).as("_s"))
      .repartition(col(idCol))
    val mx = slim.groupBy(col(domainCol))
      .agg(greatest(max(col("_s")), lit(1.0)).as("_mx"))
    val base = slim.join(broadcast(mx), domainCol)
      .withColumn("_bkt", least(
        floor(col("_s") * nBuckets / col("_mx")),
        lit((nBuckets - 1).toLong)))
    val local = base.withColumn("_rn", row_number().over(
      Window.partitionBy(col(domainCol), col("_bkt"))
        .orderBy(col("_s").desc, col(idCol).asc)))
    val offs = base.groupBy(col(domainCol), col("_bkt"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_off", coalesce(
        sum(col("_c")).over(Window.partitionBy(col(domainCol))
          .orderBy(col("_bkt").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_n",
        sum(col("_c")).over(Window.partitionBy(col(domainCol))))
      .select(col(domainCol), col("_bkt"), col("_off"), col("_n"))
    local.join(broadcast(offs), Seq(domainCol, "_bkt"))
      .withColumn("_r", col("_off") + col("_rn"))
      .select(col(idCol), col(domainCol),
        when(col("_r") <= ceil(lit(headFrac) * col("_n")), lit("head"))
          .when(col("_r") <= ceil(lit(headFrac + midFrac) * col("_n")),
            lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** Interpolated Kneser–Ney bigram conditionals in exact micro-units
    * — the smoothing the CCNet/KenLM quality model actually uses,
    * under the same replay discipline as [[bigramLmScores]]: no logs,
    * no floats; every conditional is a chain of Long multiplications
    * and floor divisions, so the corpus-trained model AND every
    * per-doc score hash-replay (q168).
    *
    *   P(w₂|w₁) = max(c₁₂ − D, 0)/c₁ + λ(w₁)·P_cont(w₂)
    *   λ(w₁)    = D·N₁₊(w₁·)/c₁
    *   P_cont   = N₁₊(·w₂)/|bigram types|
    *
    * with D = `discountMicro`/1e6 (default 0.75, the standard KN
    * discount). Mass conservation (Σ_w P(w|u) ≈ 1 up to floor error)
    * is what distinguishes this from the add-one model: rare
    * continuations are scored by how many contexts they complete,
    * not how often they occur — the "Francisco problem".
    *
    * Scale shape: four keyed count tables off one bigram explode (all
    * map-side combinable), a broadcast scalar for the type count, and
    * the same slim per-doc join+sum as the add-one model. */
  def knBigramLmScores(docs: DataFrame, textCol: String, idCol: String,
      discountMicro: Long = 750000L): DataFrame = {
    require(discountMicro > 0 && discountMicro < 1000000L)
    val base = docs.select(col(idCol).as("_id"), tokens(col(textCol)).as("_tk"))
    val bg = base.filter(size(col("_tk")) >= 2)
      .select(col("_id"), explode(expr(
        "transform(sequence(0, size(_tk) - 2)," +
          " i -> struct(_tk[i] AS w1, _tk[i + 1] AS w2))")).as("_b"))
      .select(col("_id"), col("_b.w1").as("_w1"), col("_b.w2").as("_w2"))
    val c12 = bg.groupBy(col("_w1"), col("_w2")).agg(count(lit(1)).as("_c12"))
    val c1 = bg.groupBy(col("_w1")).agg(count(lit(1)).as("_c1"))
    // continuation counts: distinct successors of w1 / predecessors
    // of w2, and the distinct-bigram-type total — all derived from
    // the (already slim) c12 table
    val n1pF = c12.groupBy(col("_w1")).agg(count(lit(1)).as("_n1pf"))
    val n1pP = c12.groupBy(col("_w2")).agg(count(lit(1)).as("_n1pp"))
    val types = c12.agg(count(lit(1)).as("_bt"))
    val perDoc = bg
      .join(c12, Seq("_w1", "_w2"))
      .join(c1, Seq("_w1"))
      .join(n1pF, Seq("_w1"))
      .join(n1pP, Seq("_w2"))
      .crossJoin(broadcast(types))
      .withColumn("_s", expr(
        s"(greatest(_c12 * 1000000 - ${discountMicro}L, 0L) div _c1)" +
          s" + ((((${discountMicro}L * _n1pf) div _c1)" +
          s" * ((_n1pp * 1000000) div _bt)) div 1000000)"))
      .groupBy(col("_id"))
      .agg(sum(col("_s")).as("kn_micro_sum"), count(lit(1)).as("n_bigrams"))
    docs.select(col(idCol).as("_id"))
      .join(perDoc, Seq("_id"), "left")
      .select(col("_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("kn_micro_sum"), lit(0L)).as("kn_micro_sum"),
        (col("kn_micro_sum").cast("double")
          / col("n_bigrams").cast("double")).as("kn_mean_micro"))
  }

  def bigramLmScores(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val base = docs.select(col(idCol).as("_id"), tokens(col(textCol)).as("_tk"))
    val bg = base.filter(size(col("_tk")) >= 2)
      .select(col("_id"), explode(expr(
        "transform(sequence(0, size(_tk) - 2)," +
          " i -> struct(_tk[i] AS w1, _tk[i + 1] AS w2))")).as("_b"))
      .select(col("_id"), col("_b.w1").as("_w1"), col("_b.w2").as("_w2"))
    val c12 = bg.groupBy(col("_w1"), col("_w2")).agg(count(lit(1)).as("_c12"))
    val c1 = bg.groupBy(col("_w1")).agg(count(lit(1)).as("_c1"))
    val vocab = base.select(explode(col("_tk")).as("_t"))
      .agg(count_distinct(col("_t")).as("_v"))
    val perDoc = bg
      .join(c12, Seq("_w1", "_w2"))
      .join(c1, Seq("_w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("_s", expr("((_c12 + 1) * 1000000) div (_c1 + _v)"))
      .groupBy(col("_id"))
      .agg(sum(col("_s")).as("lm_micro_sum"), count(lit(1)).as("n_bigrams"))
    docs.select(col(idCol).as("_id"))
      .join(perDoc, Seq("_id"), "left")
      .select(col("_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_micro_sum"), lit(0L)).as("lm_micro_sum"),
        (col("lm_micro_sum").cast("double")
          / col("n_bigrams").cast("double")).as("lm_mean_micro"))
  }

  /** Blocklist term-hit scoring (the RefinedWeb/C4 "NSFW wordlist"
    * stage as a SIGNAL, not just a gate): per document, the total
    * number of blocklist-term occurrences (word-boundary matched,
    * case-insensitive), the number of DISTINCT terms hit, and a keep
    * flag (total hits under `maxHits`). Counting instead of gating
    * lets a curation pipeline tune the threshold per corpus and audit
    * what the gate would remove — the dashboard a wordlist decision
    * actually uses.
    *
    * MAP-ONLY: one codegen'd regexp_extract_all per doc, no shuffle,
    * stream-safe. Terms are spliced into one alternation — validated
    * to plain word characters so a term can't inject regex syntax. */
  /** All word-boundary blocklist-term matches in `text` (validated,
    * lowercased, deterministic alternation order) — the shared kernel
    * of [[blocklistHits]] and [[blocklistKeep]]. */
  def blocklistMatches(text: Column, terms: Seq[String]): Column = {
    require(terms.nonEmpty, "blocklist needs at least one term")
    require(terms.forall(
        _.matches("[A-Za-z0-9](?:[A-Za-z0-9']*[A-Za-z0-9])?")),
      "blocklist terms must be plain words with word characters at both " +
        "ends — they are spliced into a \\b-anchored regex, and \\b next " +
        "to an edge apostrophe can never match standalone text")
    val pat = "\\b(" + terms.map(_.toLowerCase).distinct.sorted
      .mkString("|") + ")\\b"
    regexp_extract_all(lower(text), lit(pat), lit(1))
  }

  /** Column-level keep gate: fewer than `maxHits` blocklist-term
    * occurrences — composable into one map-only select
    * ([[graft.ext.Curation.webCurate]]). */
  def blocklistKeep(text: Column, terms: Seq[String],
      maxHits: Int = 2): Column = {
    require(maxHits >= 0)
    size(blocklistMatches(text, terms)) < maxHits
  }

  def blocklistHits(docs: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], maxHits: Int = 2): DataFrame = {
    require(maxHits >= 0)
    val hits = blocklistMatches(col(textCol), terms)
    docs.select(col(idCol),
      size(hits).as("n_hits"),
      size(array_distinct(hits)).as("n_terms"),
      (size(hits) < maxHits).as("keep"))
  }

  /** UL2-style mixture-of-denoisers training-pair builder (Tay et al.
    * 2022): each document is deterministically assigned one denoiser
    * by a Knuth multiplicative hash of its id — R (regular T5 span
    * corruption at `rateR`), X (extreme corruption at `rateX`), or S
    * (sequential PrefixLM: the last max(1, n/4) tokens become the
    * target behind a single sentinel) — and rendered to the
    * (input_text, targets) pair that mode produces. R and X reuse the
    * q149 span-corruption kernel with mode-specific mask rates; S is
    * a pure slice. Empty docs render to empty pairs in every mode.
    *
    * MAP-ONLY: the mode hash, both masks, and all three renderings
    * are per-row expressions; the when-chain picks one — no shuffle,
    * stream-safe, same scale shape as [[spanCorrupt]]. */
  def mixtureDenoise(docs: DataFrame, textCol: String, idCol: String,
      rateR: Int = 150000, rateX: Int = 400000): DataFrame = {
    require(rateR > 0 && rateR < 1000000 && rateX > 0 && rateX < 1000000)
    val base = docs.select(col(idCol), tokens(col(textCol)).as("_tk"))
    def mask(rate: Int): Column =
      transform(sequence(lit(1), size(col("_tk"))), i =>
        pmod(pmod(col(idCol) * lit(1000003L) + i.cast("long"),
          lit(2147483648L)) * lit(2654435761L), lit(2147483647L))
          % lit(1000000L) < lit(rate.toLong))
    val md = pmod(pmod(col(idCol) * lit(2654435761L),
      lit(2147483647L)), lit(3L))
    val n = size(col("_tk"))
    val cut = n - greatest(lit(1),
      floor(n.cast("double") / lit(4.0)).cast("int"))
    val sInput = when(n === 0, lit("")).otherwise(concat_ws(" ",
      concat(slice(col("_tk"), lit(1), cut), array(lit("<extra_id_0>")))))
    val sTarget = when(n === 0, lit("")).otherwise(concat_ws(" ",
      concat(array(lit("<extra_id_0>")),
        slice(col("_tk"), cut + 1, n - cut))))
    import graft.functions.{VectorFunctions => VF}
    base.withColumn("_mR", mask(rateR)).withColumn("_mX", mask(rateX))
      .select(col(idCol),
        when(md === 0, lit("r")).when(md === 1, lit("x"))
          .otherwise(lit("s")).as("mode"),
        when(md === 0,
            VF.spanCorrupt(col("_tk"), col("_mR"), targets = false))
          .when(md === 1,
            VF.spanCorrupt(col("_tk"), col("_mX"), targets = false))
          .otherwise(sInput).as("input_text"),
        when(md === 0,
            VF.spanCorrupt(col("_tk"), col("_mR"), targets = true))
          .when(md === 1,
            VF.spanCorrupt(col("_tk"), col("_mX"), targets = true))
          .otherwise(sTarget).as("targets"))
  }

  /** Script/charset profile — the char-class censor a multilingual
    * crawl runs before (and as a sanity check on) model-based
    * language ID: exact per-document counts of Latin letters,
    * Cyrillic (U+0400–U+04FF), CJK unified ideographs
    * (U+4E00–U+9FFF), digits, whitespace, and U+FFFD replacement
    * characters (the mojibake signature of a charset-decoding bug
    * upstream), plus a dominant-script label (cjk if it strictly
    * beats both alphabets, else cyrillic if it beats latin, else
    * latin — a pinned deterministic tie order).
    *
    * Counts are length-difference after codepoint-range
    * regexp_replace — explicit \\uXXXX ranges, not \\p{script=…}
    * classes, so the Java-regex engine and an RE2-based oracle see
    * byte-identical semantics. MAP-ONLY, stream-safe, no shuffle. */
  /** Intra-document duplicate-line removal — the within-page
    * complement of the corpus-global [[graft.ext.Dedup.lineDedupGlobal]]
    * (and the REMOVAL counterpart of the gopher `dup_line_frac`
    * SIGNAL): later occurrences of a (trimmed, non-empty) line already
    * seen in the same document are dropped, first occurrence and line
    * order preserved, empty lines untouched. Returns (idCol,
    * clean_text, n_lines, n_dupes_removed).
    *
    * MAP-ONLY: one higher-order fold per document (state = seen keys +
    * surviving lines + removed count), no explode, no shuffle,
    * stream-safe. Cost is O(lines² ) per doc via array_contains —
    * fine at real page line counts (tens to hundreds); a corpus of
    * pathological million-line docs would want a set-based kernel
    * like [[graft.functions.TextKernels.winnowFingerprint]]. */
  def dedupLinesWithin(docs: DataFrame, textCol: String, idCol: String)
      : DataFrame = {
    val ls = split(col(textCol), "\n", -1)
    val init = struct(
      array().cast("array<string>").as("seen"),
      array().cast("array<string>").as("out"),
      lit(0).as("nd"))
    val folded = aggregate(ls, init, (acc, l) => {
      val k = trim(l)
      val isEmpty = length(k) === 0
      val dup = array_contains(acc.getField("seen"), k)
      struct(
        when(isEmpty || dup, acc.getField("seen"))
          .otherwise(concat(acc.getField("seen"), array(k))).as("seen"),
        when(isEmpty || !dup,
          concat(acc.getField("out"), array(l)))
          .otherwise(acc.getField("out")).as("out"),
        (acc.getField("nd") +
          when(!isEmpty && dup, 1).otherwise(0)).as("nd"))
    })
    docs.select(col(idCol),
      concat_ws("\n", folded.getField("out")).as("clean_text"),
      size(ls).as("n_lines"),
      folded.getField("nd").as("n_dupes_removed"))
  }

  private def classCount(text: Column, pat: String): Column =
    length(text) - length(regexp_replace(text, pat, ""))

  /** Column-level dominant-script label with the pinned tie order
    * (cjk on strict wins, then cyrillic over latin) — composable into
    * one map-only select ([[graft.ext.Curation.webCurate]]). */
  def scriptLabel(text: Column): Column = {
    val nLatin = classCount(text, "[A-Za-z]")
    val nCyr = classCount(text, "[\\u0400-\\u04FF]")
    val nCjk = classCount(text, "[\\u4E00-\\u9FFF]")
    when(nCjk > nLatin && nCjk > nCyr, lit("cjk"))
      .when(nCyr > nLatin, lit("cyrillic"))
      .otherwise(lit("latin"))
  }

  def scriptProfile(docs: DataFrame, textCol: String, idCol: String)
      : DataFrame = {
    def cnt(pat: String): Column = classCount(col(textCol), pat)
    docs.select(col(idCol),
      length(col(textCol)).as("n_chars"),
      cnt("[A-Za-z]").as("n_latin"),
      cnt("[\\u0400-\\u04FF]").as("n_cyrillic"),
      cnt("[\\u4E00-\\u9FFF]").as("n_cjk"),
      cnt("[0-9]").as("n_digit"),
      cnt("\\s").as("n_space"),
      cnt("\\uFFFD").as("n_replacement"),
      scriptLabel(col(textCol)).as("script"))
  }

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    * SIGMOD'03 — the MOSS local fingerprinting scheme). Over the
    * lowercased, whitespace-stripped text: hash every k-gram with the
    * q31 polynomial (mod 1e9+7), slide a window of w consecutive gram
    * hashes, keep the RIGHTMOST minimal hash of each window, and emit
    * the per-document distinct (fingerprint, gram-position) pairs.
    * Guarantee: any match of length ≥ w+k−1 shares a fingerprint; no
    * match shorter than k is ever detected. Documents shorter than a
    * full window contribute their single best hash; documents shorter
    * than k contribute nothing.
    *
    * MAP-ONLY — strip/lower is one regexp_replace and everything else
    * (k-gram poly hashing + amortized-O(len) monotone-deque window
    * selection, dedup included) is ONE codegen'd kernel
    * ([[graft.functions.TextKernels.winnowFingerprint]]) whose encoded
    * picks explode straight to rows, so no shuffle exists in the plan
    * at all and no per-gram intermediate is ever materialized (the
    * split-chars + HOF-fold formulation this replaced benched 8.1 s on
    * the sf0.1 corpus). 100 TB: embarrassingly parallel over docs,
    * like q31/q128. */
  def winnowFingerprints(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 5, w: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(w >= 1, s"w must be >= 1, got $w")
    val stripped = regexp_replace(lower(col(textCol)), "\\s+", "")
    // windows end at j ∈ [min(w,m) .. m], span [max(1, j−w+1) .. j];
    // ties resolve RIGHTMOST (pinned in kernel and oracle alike);
    // picks arrive (hash << 32 | pos)-encoded, distinct per doc
    docs
      .select(col(idCol),
        explode(graft.functions.VectorFunctions
          .winnowFingerprint(stripped, k, w)).as("_e"))
      .select(col(idCol),
        shiftrightunsigned(col("_e"), 32).as("fp"),
        col("_e").bitwiseAND(lit(0xFFFFFFFFL)).as("pos"))
  }

  /** Content-defined chunking (the rolling-boundary discipline of
    * rsync/LBFS, Muthitacharoen et al. SOSP'01, degenerated to a
    * stateless k-gram boundary so every cut replays in ANSI SQL):
    * split each document where the k-gram hash ending at a position
    * divides `div` — boundaries move WITH content, so an insertion
    * early in a document shifts only the chunk it lands in, and
    * byte-identical passages chunk identically across documents.
    * That is the property payload-level dedup needs and fixed-width
    * chunking (q122) structurally cannot give.
    *
    * One codegen'd kernel per document ([[graft.functions.CdcChunks]],
    * expected chunk length ≈ `div` codepoints), then explode — no
    * shuffle until the caller aggregates chunk identities.
    * Embarrassingly parallel over docs at 100 TB, like q31/q177.
    * Returns `keep` columns + (chunk_hash, chunk_len) per chunk in
    * document order. */
  def cdcChunks(docs: DataFrame, textCol: String, keep: Seq[String],
      k: Int = 8, div: Long = 16L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(div >= 2, s"div must be >= 2, got $div")
    docs
      .select(keep.map(col) :+
        explode(graft.functions.VectorFunctions
          .cdcChunks(col(textCol), k, div)).as("_e"): _*)
      .select(keep.map(col) :+
        shiftrightunsigned(col("_e"), 32).as("chunk_hash") :+
        col("_e").bitwiseAND(lit(0xFFFFFFFFL)).as("chunk_len"): _*)
  }
}
