package graft.web

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the prerequisite for (url, warc_ts)-keyed dedup and
  * sessionization: the same page crawled via `HTTPS://Example.COM/a?utm_source=x`
  * and `https://example.com/a` must land on one key.
  *
  * Rules (all pure column expressions, mirrored 1:1 in the q_url_canon oracle):
  *  1. strip the fragment
  *  2. lowercase scheme + authority (path/query stay case-sensitive per RFC 3986)
  *  3. drop tracking params (utm_*, gclid, fbclid), preserving the rest in order
  *  4. collapse an empty path to "/", strip a single trailing slash elsewhere
  */
object UrlOps {

  private val headRx = "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"

  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val head = lower(regexp_extract(noFrag, headRx, 1))
    val path = regexp_extract(noFrag, headRx + "([^?#]*)", 2)
    val query = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val keptParams = filter(split(query, "&"),
      p => length(p) > 0 && !p.rlike("^(utm_[a-zA-Z0-9_]*|gclid|fbclid)="))
    val canonPath = when(path === "" || path === "/", lit("/"))
      .otherwise(regexp_replace(path, "/$", ""))
    // scheme-less / relative / unparseable urls pass through unchanged — collapsing
    // them all onto one key would silently merge unrelated rows in url-keyed dedup
    when(head === "", u).otherwise(
      concat(head, canonPath,
        when(size(keptParams) > 0, concat(lit("?"), array_join(keptParams, "&")))
          .otherwise(lit(""))))
  }

  /** Lowercased registered host of an absolute URL (authority minus userinfo and
    * port) — the node key for host-graph operators ([[HostGraph]]) and domain
    * caps. Bracketed IPv6 authorities keep their brackets as the key (the colon
    * inside is part of the address, not a port separator). Scheme-less /
    * relative / unparseable inputs yield NULL, so graph builders drop them
    * instead of clustering them under "". */
  def hostOf(u: Column): Column = {
    val host = lower(regexp_extract(u,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?(\\[[^\\]/?#]+\\]|[^/?#:]+)", 1))
    when(host === "", lit(null)).otherwise(host)
  }
}
