package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the key that crawl-scale exact dedup and
  * resume actually group by (raw crawl URLs differ in case, default
  * ports, tracking params and fragments while naming one resource).
  * Pure Catalyst string/array functions, formula mirrored exactly in
  * the DuckDB oracle (q18).
  */
object Urls {

  /** Canonical form: lowercase scheme+host, default port stripped
    * (:80 http, :443 https), empty path → "/", query params sorted
    * with tracking params (utm_*, fbclid, gclid) and empties removed,
    * fragment dropped.
    */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val rawHost = lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1))
    val host = when(scheme === "http", regexp_replace(rawHost, ":80$", ""))
      .when(scheme === "https", regexp_replace(rawHost, ":443$", ""))
      .otherwise(rawHost)
    val rawPath = regexp_extract(url, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    val path = when(length(rawPath) === 0, "/").otherwise(rawPath)
    val rawQuery = regexp_extract(url, "[?]([^#]*)", 1)
    val kept = array_join(
      array_sort(filter(split(rawQuery, "&"),
        t => length(t) > 0 && !t.rlike("^(utm_|fbclid|gclid)"))), "&")
    val qpart = when(length(kept) === 0, "").otherwise(concat(lit("?"), kept))
    concat(scheme, lit("://"), host, path, qpart)
  }
}
