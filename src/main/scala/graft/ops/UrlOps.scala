package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for a web crawl — the step BEFORE exact/near dedup
  * on a webtext corpus: the same page arrives as `HTTP://Example.com:80/a/`
  * and `http://example.com/a?utm_source=x`, and naive hash-dedup treats
  * them as distinct documents.
  *
  * Canonical form: lowercase scheme and host, default ports stripped
  * (`:80` for http, `:443` for https), fragment dropped, tracking
  * parameters removed (`utm_*`, `gclid`, `fbclid`, `ref`), remaining query
  * parameters sorted bytewise, redundant trailing slashes collapsed (empty
  * path → `/`).
  *
  * Everything is a pure Column expression (regexp_extract / higher-order
  * filter / array_sort) — codegen-visible, no UDF, and an independent
  * engine can recompute the exact canonical string with the same regexes
  * (the q_url_canonical DuckDB oracle does). Query-param arrays are tiny,
  * so the HOF stages stay off the measured re-evaluation trap.
  */
object UrlOps {

  /** `scheme://host` with lowercased scheme+host and default port removed. */
  def urlOrigin(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val noDefault = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    concat(scheme, lit("://"), noDefault)
  }

  /** Lowercased host without port. */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)", 1))

  /** Path with trailing-slash runs collapsed; empty path canonicalizes to "/". */
  def urlPathNorm(url: Column): Column = {
    val path = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val stripped = regexp_replace(path, "/+$", "")
    when(stripped === "", lit("/")).otherwise(stripped)
  }

  /** Sorted non-tracking query params, or "" when none survive. */
  def urlQueryNorm(url: Column): Column = {
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val params = filter(split(query, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[^=]*|gclid|fbclid|ref)="))
    when(size(params) > 0, array_join(array_sort(params), "&")).otherwise(lit(""))
  }

  /** The full canonical URL. */
  def canonicalizeUrl(url: Column): Column = {
    val q = urlQueryNorm(url)
    concat(urlOrigin(url), urlPathNorm(url),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }
}
