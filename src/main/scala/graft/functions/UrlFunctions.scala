package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * URL canonicalization for web corpora — the normalization pass that runs
 * before URL-keyed dedup and per-domain caps (every CC-derived dataset
 * keys on canonical URLs). Pure regexp/string Column compositions:
 * codegen'd, shuffle-free, linear; and deliberately RE2-safe (no
 * lookaround, no backrefs in patterns) so any engine reproduces the
 * exact same canonical form.
 *
 * Normalization order (each step's output feeds the next):
 *   1. strip the `#fragment`
 *   2. lowercase the `scheme://authority` prefix (path/query case kept —
 *      paths are case-sensitive, hosts are not)
 *   3. drop default ports (`:80` for http, `:443` for https)
 *   4. strip a leading `www.`
 *   5. remove tracking query params (`utm_*`, `fbclid`, `gclid`, `ref`)
 *      and tidy the leftover `?`/`&` artifacts
 *   6. strip a single trailing `/` (at end-of-string and at the `/?` seam)
 */
object UrlFunctions {

  /** Canonical form of a URL column (see object doc for the exact steps). */
  def normalizeUrl(url: Column): Column = {
    // 1. fragment
    val noFrag = regexp_replace(url, "#.*", "")
    // 2. lowercase scheme://authority only
    val prefix = regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val lowered = concat(lower(prefix), noFrag.substr(length(prefix) + 1, lit(1000000)))
    // 3. default ports (authority ends at /, ? or end-of-string)
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(http://[^/:?#]+):80([/?]|$)", "$1$2"),
      "^(https://[^/:?#]+):443([/?]|$)", "$1$2")
    // 4. www. — anchored to the URL's own scheme seam; an unanchored
    //    "://www\\." would also rewrite URLs embedded in query values
    val noWww = regexp_replace(noPort, "^([a-z][a-z0-9+.-]*://)www\\.", "$1")
    // 5. tracking params ([?&]-anchored so `pref=` never matches `ref=`),
    //    then tidy the artifacts: && runs, the ?& seam, trailing ?/&
    val noTrack = regexp_replace(noWww,
      "([?&])(utm_[a-zA-Z0-9]+|fbclid|gclid|ref)=[^&#]*", "$1")
    val tidied = regexp_replace(
      regexp_replace(regexp_replace(noTrack, "&&+", "&"), "^([^?]*\\?)&+", "$1"),
      "[?&]+$", "")
    // 6. trailing slash — at end-of-string and at the path/query seam.
    //    The seam is the FIRST `?` only (anchored via [^?]*): an unanchored
    //    "/\\?" would also collapse `/?` sequences inside query values
    regexp_replace(regexp_replace(tidied, "^([^?]*)/\\?", "$1?"), "/$", "")
  }

  /** Host of an (ideally normalized) URL; null when no scheme://host. */
  def urlHost(url: Column): Column = {
    val h = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1)
    when(h === "", lit(null).cast("string")).otherwise(lower(h))
  }

  /**
   * Registrable-domain approximation: the last two dot-labels of the host
   * (`news.example.co.uk` → `co.uk` — WRONG for multi-label public
   * suffixes; a faithful answer needs the Public Suffix List as a
   * broadcast table, which this container does not ship). Honest
   * approximation for grouping/caps on ordinary `.com/.org/.de` hosts.
   */
  def urlDomain(url: Column): Column = {
    val host = urlHost(url)
    val dom = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    // regexp_extract returns "" (never null) on no-match: dotless hosts
    // (localhost, intranet names) must yield null, not one "" domain group
    when(host.isNull || dom === "", lit(null).cast("string")).otherwise(dom)
  }
}
