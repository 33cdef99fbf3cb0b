package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Registered-domain extraction with public-suffix-list SEMANTICS
  * (E238) — the CCNet/RefinedWeb URL-dedup key: per-domain caps and
  * domain-level dedup need `sub.a.example.co.uk` and `example.co.uk` to
  * collapse to ONE registrable key, which the "last two labels"
  * heuristic ([[UrlFunctions.domain]]) gets wrong for every
  * second-level ccTLD (`example.co.uk` → `co.uk`, merging every UK
  * site into one cap bucket).
  *
  * The ALGORITHM is PSL-faithful (publicsuffix.org/list/ semantics):
  *  - the longest matching rule wins; a wildcard rule `*.<tld>`
  *    matches any single label in its position; an exception rule
  *    `!host` overrides a wildcard and makes the rule itself the
  *    registrable domain;
  *  - the registrable ("registered") domain is the matched public
  *    suffix plus exactly one more label; a host that IS a public
  *    suffix has no registrable domain (null);
  *  - unknown TLDs fall to the implicit `*` rule (last label is the
  *    suffix) — so plain gTLDs need no enumeration at all;
  *  - matching is on the punycode (xn--) form, lowercased, trailing
  *    root dot stripped; IP-literal hosts are their own key.
  *
  * The rule TABLE is a representative compiled-in subset (zero-egress
  * sandbox — no network fetch of the live list): the three rule CLASSES
  * that change behavior (multi-label exact suffixes, wildcards,
  * exceptions) are each populated; swapping in the full list is a data
  * change, not a code change. Rule constants are the single source of
  * truth for BOTH engines — the DuckDB oracle's IN-lists are generated
  * from these Seqs.
  *
  * Pure column expressions (codegen'd, scan-speed, no UDF); every regex
  * is valid in BOTH Java regex and RE2 with identical semantics (the
  * UrlFunctions contract). DIVERGENCE TRAP pinned here: DuckDB's
  * `regexp_replace` replaces the FIRST match unless the 'g' flag is
  * passed — every mirrored replace in the oracle carries 'g'.
  *
  * Cites reference scope: URL/domain analysis is absent from
  * awsdataprofiler (Profiler.scala:166-253 profiles only) — extension
  * per SURVEY §2.E.
  */
object DomainFunctions {

  /** Exact second-level public suffixes (PSL exact rules with two
    * labels) — a representative ccTLD subset. */
  val TwoLabelSuffixes: Seq[String] = Seq(
    "co.uk", "ac.uk", "gov.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk",
    "net.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
    "com.br", "org.br", "net.br", "gov.br", "edu.br",
    "co.in", "net.in", "org.in", "ac.in", "edu.in", "res.in", "gov.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.mx", "org.mx", "net.mx", "edu.mx", "gob.mx",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "co.kr", "or.kr", "ne.kr", "re.kr", "go.kr", "ac.kr",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr",
    "co.za", "org.za", "net.za", "gov.za", "ac.za", "web.za",
    "com.ar", "org.ar", "net.ar", "edu.ar", "gob.ar",
    "co.il", "org.il", "net.il", "ac.il", "gov.il",
    "com.hk", "org.hk", "net.hk", "edu.hk", "gov.hk",
    "com.tw", "org.tw", "net.tw", "edu.tw", "gov.tw")

  /** Wildcard rules `*.<tld>`: every 2-label host under them is itself
    * a public suffix (the PSL's `*.ck` is the canonical example). */
  val WildcardTlds: Seq[String] = Seq("ck", "er")

  /** Exception rules (`!www.ck`): the rule itself is registrable
    * despite the wildcard covering its TLD. */
  val ExceptionRules: Seq[String] = Seq("www.ck")

  /** Lowercased host from a URL: fragment dropped, authority extracted,
    * userinfo (`user:p%40ss@`) and port stripped, trailing root dot
    * removed. Null (not '') when the URL has no parseable host. */
  def hostOf(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val auth = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val noUser = regexp_replace(auth, "^[^@]*@", "")
    val noPort = regexp_replace(noUser, ":[0-9]+$", "")
    val h = lower(regexp_replace(noPort, "\\.$", ""))
    when(length(h) > 0, h)
  }

  /** PSL-semantics registrable domain of a lowercased host; null when
    * the host has none (it IS a public suffix, or is a single label
    * under the implicit `*` rule). IP-literal hosts are their own key
    * (they cap per address). */
  def registeredDomain(host: Column): Column = {
    val last1 = regexp_extract(host, "([^.]+)$", 1)
    val last2 = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    val last3 = regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    val nLabels =
      length(host) - length(regexp_replace(host, "\\.", "")) + lit(1)
    val isIp = host.rlike("^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$")
    val exception = ExceptionRules.map { e =>
      (host === e || host.endsWith("." + e)) -> lit(e)
    }
    val base =
      when(host.isNull, lit(null).cast("string"))
        .when(isIp, host)
    val withExceptions = exception.foldLeft(base) {
      case (acc, (cond, rule)) => acc.when(cond, rule)
    }
    withExceptions
      .when(last2.isin(TwoLabelSuffixes: _*), when(nLabels >= 3, last3))
      .when(last1.isin(WildcardTlds: _*), when(nLabels >= 3, last3))
      .otherwise(when(nLabels >= 2, last2))
  }

  /** [[registeredDomain]] of a URL column. */
  def registeredDomainOf(url: Column): Column =
    registeredDomain(hostOf(url))
}
