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

  /** Authority with userinfo DROPPED (credentials never identify a distinct
    * document — the same page with and without `user:pw@` must canonicalize
    * identically) and lowercased. IPv6 bracket literals pass through.
    */
  private def authorityNorm(url: Column): Column = {
    val authority = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    lower(regexp_replace(authority, "^[^@/\\[\\]]*@", ""))
  }

  /** `scheme://host` with lowercased scheme+host, userinfo dropped, and the
    * scheme's default port removed (`[::1]:80` handled — the pattern only
    * strips a trailing `:digits`, never bracketed colons).
    */
  def urlOrigin(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = authorityNorm(url)
    val noDefault = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    concat(scheme, lit("://"), noDefault)
  }

  /** Lowercased host: userinfo and port stripped; IPv6 literals keep their
    * brackets (`[::1]` — the port pattern cannot match inside them).
    */
  def urlHost(url: Column): Column =
    regexp_replace(authorityNorm(url), ":[0-9]+$", "")

  /** Path with trailing-slash runs collapsed; empty path canonicalizes to "/". */
  def urlPathNorm(url: Column): Column = {
    val path = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val stripped = regexp_replace(path, "/+$", "")
    when(stripped === "", lit("/")).otherwise(stripped)
  }

  /** Sorted non-tracking query params, or "" when none survive. */
  def urlQueryNorm(url: Column): Column = {
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    // (=|$): a VALUELESS tracking param ("?utm_source") must also drop, or
    // the same page with and without it canonicalizes differently
    val params = filter(split(query, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[^=&]*|gclid|fbclid|ref)(=|$)"))
    when(size(params) > 0, array_join(array_sort(params), "&")).otherwise(lit(""))
  }

  /** The full canonical URL. */
  def canonicalizeUrl(url: Column): Column = {
    val q = urlQueryNorm(url)
    concat(urlOrigin(url), urlPathNorm(url),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }
}
