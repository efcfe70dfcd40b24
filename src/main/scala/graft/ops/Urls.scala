package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** URL canonicalization — the key that crawl-scale exact dedup and
  * resume actually group by (raw crawl URLs differ in case, default
  * ports, percent-encoding, slash runs, tracking params and fragments
  * while naming one resource). Catalyst string/array functions plus the
  * codegen'd `PercentNormalize` expression; the q18 DuckDB oracle
  * computes the same rules independently (list/string SQL), so this is
  * a genuine two-implementation cross-check, not a formula mirror.
  */
object Urls {

  /** Canonical form (r6 rules in order):
    *  1. scheme-less input passes through UNCHANGED — without a scheme
    *     the generic-URI rules below don't apply, and mapping every
    *     malformed string onto one constant key would collapse distinct
    *     crawl entries into a single exact-dedup group (ADVICE r5 low);
    *  2. lowercase scheme + host, default port stripped (:80 http,
    *     :443 https), internationalized hostnames folded to their
    *     punycode ACE form (RFC 3490; `bücher.example` ≡
    *     `xn--bcher-kva.example`). `www.` is deliberately NOT folded:
    *     www and apex are distinct authorities that can serve distinct
    *     content, so folding would merge genuinely different documents
    *     — a policy decision, recorded here;
    *  3. percent-encoding normalized in path and query (RFC 3986
    *     §6.2.2: uppercase hex, unreserved escapes decoded) — cannot
    *     introduce '/', '&' or '=' since those are reserved, so it
    *     commutes with the splitting below;
    *  4. slash runs in the path collapse to one, empty path → "/",
    *     trailing slash dropped (except the root path itself);
    *  5. query params sorted, tracking params (utm_*, fbclid, gclid)
    *     and empties removed, fragment dropped.
    */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val rawHost = lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1))
    val host = GraftFunctions.idnAscii(
      when(scheme === "http", regexp_replace(rawHost, ":80$", ""))
        .when(scheme === "https", regexp_replace(rawHost, ":443$", ""))
        .otherwise(rawHost))
    val rawPath = regexp_extract(url, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    val pathNorm = regexp_replace(
      GraftFunctions.pctNorm(when(length(rawPath) === 0, "/").otherwise(rawPath)),
      "/{2,}", "/")
    val path = when(pathNorm === "/", pathNorm)
      .otherwise(regexp_replace(pathNorm, "/$", ""))
    val rawQuery = GraftFunctions.pctNorm(regexp_extract(url, "[?]([^#]*)", 1))
    val kept = array_join(
      array_sort(filter(split(rawQuery, "&"),
        t => length(t) > 0 && !t.rlike("^(utm_|fbclid|gclid)"))), "&")
    val qpart = when(length(kept) === 0, "").otherwise(concat(lit("?"), kept))
    when(length(scheme) === 0, url)
      .otherwise(concat(scheme, lit("://"), host, path, qpart))
  }

  /** Lowercased hostname (no port) — the per-site grouping key for
    * domain-level corpus accounting and caps. Scheme-less input yields
    * the empty string (one "unknown host" group, never a crash).
    */
  def hostOf(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z]+://([^/?#:]+)", 1))

  /** Per-host corpus accounting (q23a): docs and text volume by host —
    * the observability half of domain capping. One hash aggregation,
    * map-side partial; host cardinality is ~sites, far below docs.
    */
  def domainStats(df: DataFrame, urlCol: String = "url",
                  textCol: String = "text"): DataFrame =
    df.groupBy(hostOf(col(urlCol)).as("host"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col(textCol))).as("n_chars"))

  /** Deterministic [0,1) per-URL rank from md5 (first 13 hex chars =
    * 52 bits, exact in a double) — ANSI-expressible, so `capPerDomain`
    * runs under the DuckDB oracle with the identical rule. Production
    * callers on a cluster can pass an xxhash64-derived rank instead
    * (codegen'd, ~10× cheaper) — the cap semantics don't change.
    */
  def md5Rank(c: Column): Column =
    conv(substring(md5(c), 1, 13), 16, 10).cast("double") /
      lit(4503599627370496.0) // 2^52

  /** Production twin of `md5Rank`: xxhash64 (codegen'd, one pass, no
    * hex round-trip) mapped from signed-long range onto [0,1). Not
    * ANSI-expressible, so the oracled q23 path uses `md5Rank`; the
    * composed pipeline uses this.
    */
  def xxRank(c: Column): Column =
    xxhash64(c).cast("double") / lit(1.8446744073709552e19) + lit(0.5)

  /** Per-host document cap (q23) — the C4/CCNet-style guard against a
    * handful of mega-hosts (forums, link farms, wikis) dominating the
    * corpus. SCALE SHAPE: the obvious `row_number() OVER (PARTITION BY
    * host)` funnels every document of a mega-host into one reducer and
    * sorts it — exactly the skew this op exists to fight. Instead:
    * hash-rate sampling — one host-count aggregation, a co-partitioned
    * join back (AQE broadcasts the host table when small), and a
    * per-row keep rule `rank(url) < maxDocs / hostDocs` with a
    * deterministic [0,1) rank. Over-cap hosts keep ~maxDocs documents
    * in expectation (binomial, NOT exactly maxDocs — the documented
    * trade for a shape with no per-host sort and no window exchange);
    * under-cap hosts pass untouched. The rank is a pure function of
    * the URL, so re-runs and resumes keep the SAME documents.
    */
  def capPerDomain(df: DataFrame, maxDocs: Int, urlCol: String = "url",
                   rank: Column => Column = md5Rank): DataFrame = {
    val withHost = df.withColumn("host", hostOf(col(urlCol)))
    val counts = withHost.groupBy("host")
      .agg(count(lit(1)).as("host_docs"))
    withHost.join(counts, Seq("host"))
      .filter(col("host_docs") <= maxDocs ||
        rank(col(urlCol)) < lit(maxDocs.toDouble) / col("host_docs"))
      .drop("host", "host_docs")
  }
}
