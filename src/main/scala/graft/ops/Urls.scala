package graft.ops

import org.apache.spark.sql.Column
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
}
