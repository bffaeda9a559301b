package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL operators for web-scale training-data pipelines — the stage that
  * runs BEFORE text dedup in C4/CCNet-style corpus builds: canonicalize
  * each document's source URL, dedup at URL granularity (the cheapest
  * dedup signal there is — no text travels at all), and measure the
  * domain mix that drives sampling weights.
  *
  * Everything is a codegen'd projection over built-in Catalyst string
  * functions (lower / regexp_extract / regexp_replace / concat / CASE) —
  * no UDFs, no custom expressions — restricted to the regex subset Java
  * and RE2 agree on (no backreferences, no lookaround) so the DuckDB
  * oracle replays the identical chain.
  *
  * Scale notes (the 100-TB contract):
  *  - normalization is per-row, shuffle-free, whole-stage codegen;
  *  - [[dedupByUrl]] shuffles a 64-bit hash of the NORMALIZED url plus a
  *    64-bit id — never the url text, never the document — one exchange,
  *    partial-aggregable min;
  *  - [[domainMix]] shuffles one (domain) key per row with map-side
  *    combine; the grand total rides back as a 1-row broadcast.
  */
object UrlOps {

  /** Query parameters that carry tracking state, not content identity
    * (the usual strip list: Google/Facebook/Microsoft click ids + utm_*). */
  val trackingParams = "(utm_[A-Za-z0-9]+|fbclid|gclid|msclkid|ref)"

  /** Second-level public suffixes where the registered domain is three
    * labels, not two (snippet of the public-suffix list — the full list
    * is a catalog asset a deployment drops in; the rule shape is what
    * matters here). */
  val secondLevelSuffixes = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "com.au",
    "com.br", "co.in", "co.nz", "com.mx")

  /** Canonical URL: lowercase scheme+host, userinfo and default ports
    * stripped, leading `www.` stripped, fragment dropped, tracking
    * params removed, duplicate slashes collapsed, trailing slash
    * dropped.  A scheme-less input is treated as http.  NULL propagates;
    * two URLs that differ only in these respects normalize equal. */
  def normalizeUrl(u: Column): Column = {
    // whitespace is invalid in a URL, so remove ALL of it up front (after
    // the fragment strip) — stray spaces anywhere would otherwise defeat
    // the anchored host rules on pass 1 but not pass 2, breaking the
    // idempotence property pinned in UrlOpsSpec
    val nofrag = regexp_replace(regexp_replace(u, "#.*$", ""), "\\s+", "")
    val schemeRaw = regexp_extract(nofrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    val scheme = when(schemeRaw === "", lit("http")).otherwise(lower(schemeRaw))
    val rest = regexp_replace(nofrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    // each host rule strips to a FIXED POINT ((www.)+, (:80)+, last '@'),
    // making normalizeUrl idempotent — pinned by the UrlOpsSpec property
    val hostport = lower(regexp_extract(rest, "^([^/?]+)", 1))
    val noUser = regexp_replace(hostport, "^.*@", "")
    val noPort =
      when(scheme === "http", regexp_replace(noUser, "(:80)+$", ""))
        .when(scheme === "https", regexp_replace(noUser, "(:443)+$", ""))
        .otherwise(noUser)
    val host = regexp_replace(noPort, "^(www[.])+", "")
    val pathq = regexp_replace(rest, "^[^/?]+", "")
    val path0 = regexp_extract(pathq, "^([^?]*)", 1)
    val path = regexp_replace(regexp_replace(path0, "/{2,}", "/"), "/+$", "")
    val query0 = regexp_extract(pathq, "[?].*", 0)
    val query1 = regexp_replace(query0, "[?&]" + trackingParams + "=[^&]*", "")
    val query = regexp_replace(query1, "^&", "?")
    concat(scheme, lit("://"), host, path, query)
  }

  /** Lowercased host of a URL: userinfo and leading `www.` stripped, and
    * EVERY port dropped — unlike [[normalizeUrl]], whose canonical form
    * keeps a non-default port (the host is a grouping key; `a.io:8443`
    * and `a.io:9000` are the same site). */
  def urlHost(u: Column): Column = {
    val nofrag = regexp_replace(regexp_replace(u, "#.*$", ""), "\\s+", "")
    val rest = regexp_replace(nofrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostport = lower(regexp_extract(rest, "^([^/?]+)", 1))
    val noUser = regexp_replace(hostport, "^.*@", "")
    regexp_replace(
      regexp_replace(noUser, "(:[0-9]+)+$", ""), "^(www[.])+", "")
  }

  /** Registered (pay-level) domain of a host: last two labels, or last
    * three when the two-label tail is a second-level public suffix
    * (`co.uk` etc.).  A dot-less host (localhost), an IPv4 literal
    * (whose "last two labels" would be a meaningless `3.4`), or a
    * bracketed IPv6 literal returns itself unchanged. */
  def registeredDomain(host: Column): Column = {
    val alts = secondLevelSuffixes.map(_.replace(".", "[.]")).mkString("|")
    val d = regexp_extract(host,
      "([^.]+[.](?:" + alts + ")|[^.]+[.][^.]+)$", 1)
    when(host.rlike("^[0-9.]+$") || host.startsWith("["), host)
      .when(d === "", host)
      .otherwise(d)
  }

  /** URL-level exact dedup: keep the smallest id per normalized URL.
    * Returns (url_hash, url_hash2, keep_id, n_dups).  The exchange
    * carries only a 128-bit composite fingerprint of the normalized url
    * (two independent 64-bit hashes — one alone would wrongly merge
    * ~10^4 url groups at 10^12 docs by the birthday bound) plus the id —
    * the standard first pass of a web-corpus build, orders of magnitude
    * cheaper than any text dedup because nothing content-sized ever
    * shuffles. */
  def dedupByUrl(docs: DataFrame, urlCol: String = "url",
                 idCol: String = "doc_id"): DataFrame = {
    val norm = normalizeUrl(col(urlCol))
    // a NULL url is missing metadata, not a duplicate: Spark hash
    // expressions SKIP null inputs (xxhash64(null) = the seed constant),
    // which would silently collapse every null-url doc into one group —
    // so null-url rows key on their own id (h2 = null cannot collide
    // with any real hash) and always survive
    val h1 = when(norm.isNotNull, xxhash64(norm)).otherwise(col(idCol))
    val h2 = when(norm.isNotNull, xxhash64(lit(1L), norm))
    docs.groupBy(h1.as("url_hash"), h2.as("url_hash2"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
  }

  /** Documents and distinct hosts per registered domain, with each
    * domain's per-million share of the corpus — the table that drives
    * domain-mixing sample weights.  One combine-enabled exchange on the
    * domain key; the grand total joins back as a 1-row broadcast (no
    * global window, which would funnel every row through one partition). */
  def domainMix(docs: DataFrame, urlCol: String = "url",
                approxHosts: Boolean = false): DataFrame = {
    val host = urlHost(col(urlCol))
    // exact countDistinct rewrites to an expand (doubles the shuffled
    // rows); at 10^12 urls flip approxHosts for one HLL pass instead —
    // the mix table drives sampling weights, where ±2% on host counts
    // is immaterial
    val nHosts =
      if (approxHosts) approx_count_distinct(col("host"), 0.02).as("n_hosts")
      else countDistinct(col("host")).as("n_hosts")
    val perDomain = docs
      .select(registeredDomain(host).as("domain"), host.as("host"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), nHosts)
    val total = perDomain.agg(sum("n_docs").as("total_docs"))
    perDomain.crossJoin(broadcast(total))
      .select(col("domain"), col("n_docs"), col("n_hosts"),
        floor((col("n_docs") * lit(1000000L)).cast("double") /
          col("total_docs").cast("double")).cast("long").as("share_ppm"))
  }
}
