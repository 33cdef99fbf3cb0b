package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the web-corpus curation step that makes
  * domain-level dedup, blocklist filtering and per-domain caps possible:
  * the same page arrives under `HTTP://WWW.Site.COM:80/page#frag` and
  * `http://site.com/page`, and until both normalize to one key every
  * domain statistic is wrong.
  *
  * Pure column expressions (codegen'd, scan-speed, no UDF). Every regex is
  * valid in BOTH Java regex and RE2 with identical leftmost-first
  * semantics (the PiiFunctions contract — no lookbehind, no backrefs), so
  * the DuckDB oracle applies the literal same patterns.
  *
  * Canonical form: lowercase scheme and host, `www.` prefix and default
  * ports (:80/:443) stripped from the host, fragment dropped, single
  * trailing slash stripped (path case PRESERVED — paths are
  * case-sensitive per RFC 3986).
  */
object UrlFunctions {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  // host ends at '/', '?' OR '#': a path-less query URL
  // (http://h?q=...) must not absorb the query into the lowercased host
  private val HostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  // path+query component starts at the first '/' or '?' (case preserved)
  private val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([/?].*)?$"

  /** Lowercased, de-`www.`ed host with default ports stripped. */
  def host(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val hp = lower(regexp_extract(noFrag, HostRe, 1))
    regexp_replace(regexp_replace(hp, ":(443|80)$", ""), "^www\\.", "")
  }

  /** Canonicalized URL (see object doc for the normal form). */
  def normalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, SchemeRe, 1))
    val path = regexp_replace(regexp_extract(noFrag, PathRe, 1), "/$", "")
    concat(scheme, lit("://"), host(url), path)
  }

  /** Registrable-domain approximation: the last two labels of the host
    * (the standard heuristic short of shipping the public-suffix list).
    * Ports — default or not — never belong to the domain key. */
  def domain(url: Column): Column =
    regexp_extract(
      regexp_replace(host(url), ":[0-9]+$", ""), "([^.]+\\.[^.]+)$", 1)
}
