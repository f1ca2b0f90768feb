package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level dedup — the standard crawl-dedup
  * stage that runs BEFORE any content hashing: a crawler sees the
  * same page under `HTTP://WWW.Site.COM:80/a/?b=2&a=1#frag` and
  * `http://site.com/a?a=1&b=2`, and canonical-URL dedup collapses
  * them without reading a byte of content. Map-only (codegen'd
  * regex/string kernels, no UDF) followed by one keyed aggregation —
  * the cheapest dedup pass in the pipeline, which is why it goes
  * first at 100 TB: every collapsed URL is a document that never
  * enters MinHash/SimHash.
  *
  * Canonical form (each rule a deterministic string rewrite both
  * engines replay):
  *  - fragment dropped (`#...` never reaches the server);
  *  - scheme and host lowercased (RFC 3986 §6.2.2.1 case
  *    normalization);
  *  - default ports stripped (`:80` for http, `:443` for https;
  *    other ports kept);
  *  - a leading `www.` dropped from the host;
  *  - trailing slashes stripped from the path (root becomes `/`);
  *  - query parameters sorted byte-lexicographically (`?b=2&a=1` ≡
  *    `?a=1&b=2` for the overwhelming majority of endpoints; empty
  *    query dropped).
  */
object Urls {

  /** Canonical form of a URL column. Column-expression only — stays
    * inside whole-stage codegen. */
  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag,
      "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostPort = regexp_extract(rest, "^([^/?]*)", 1)
    val afterHost = rest.substr(length(hostPort) + 1, length(rest))
    val bareHost = lower(regexp_replace(hostPort, ":[0-9]+$", ""))
    val host = regexp_replace(bareHost, "^www\\.", "")
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val portPart = when(port === "", lit(""))
      .when(scheme === "http" && port === "80", lit(""))
      .when(scheme === "https" && port === "443", lit(""))
      .otherwise(concat(lit(":"), port))
    val rawPath = regexp_extract(afterHost, "^([^?]*)", 1)
    val trimmed = regexp_replace(rawPath, "/+$", "")
    val path = when(trimmed === "", lit("/")).otherwise(trimmed)
    val query = regexp_extract(afterHost, "\\?(.*)$", 1)
    val queryPart = when(query === "", lit("")).otherwise(
      concat(lit("?"), array_join(array_sort(split(query, "&")), "&")))
    concat(scheme, lit("://"), host, portPart, path, queryPart)
  }

  /** Exact dedup on the canonical URL: one map-side-combinable
    * aggregation keyed by the canonical form — keeper = min id
    * (deterministic), group size. The [[Dedup.exactGroups]] shape
    * with the canonicalizer fused into the scan. */
  def canonicalDedup(df: DataFrame, urlCol: String,
      idCol: String): DataFrame =
    df.groupBy(canonicalize(col(urlCol)).as("canon_url"))
      .agg(min(col(idCol)).as("keeper_id"),
        count(lit(1)).as("n_copies"))

  /** Canonical host of a URL — lowercased, `www.`-stripped,
    * port-stripped — the node key a link graph aggregates on. */
  def host(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostPort = regexp_extract(rest, "^([^/?]*)", 1)
    regexp_replace(lower(regexp_replace(hostPort, ":[0-9]+$", "")),
      "^www\\.", "")
  }

  /** Link extraction — the crawl-graph constructor that turns text
    * into [[graft.ext.GraphOps]] input: every http(s) URL in the text
    * (whitespace-delimited, trailing sentence punctuation stripped),
    * canonicalized with the [[canonicalize]] rules, plus its
    * canonical host. Returns (idCol, url, dst_host) — one row per
    * link occurrence; join the doc's own host and aggregate for the
    * (src_host, dst_host) edge list PageRank/HITS consume.
    *
    * MAP-ONLY: one regexp_extract_all + explode per document, all
    * canonicalization pure Column expressions — no shuffle. */
  def extractLinks(docs: DataFrame, textCol: String, idCol: String)
      : DataFrame =
    docs.select(col(idCol),
        explode(regexp_extract_all(col(textCol),
          lit("https?://[^\\s]+"), lit(0))).as("_raw"))
      .select(col(idCol),
        canonicalize(regexp_replace(col("_raw"), "[.,;:!?)'\"]+$", ""))
          .as("url"))
      .withColumn("dst_host", host(col("url")))
}
