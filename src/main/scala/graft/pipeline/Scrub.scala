package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing and URL hygiene for training-data pipelines: detect /
  * count / redact emails, URLs, IPv4 addresses and phone numbers, extract
  * domains, and filter documents against a domain blocklist.
  *
  * Everything is built from `regexp_*` built-ins — fully codegen'd, no
  * UDFs, no shuffle — so scrubbing runs at scan speed and composes with
  * filter pushdown like any native expression (the standard pre-tokenizer
  * hygiene pass of public corpus recipes, e.g. C4's blocklist filtering
  * and the CCNet/RefinedWeb PII heuristics).
  *
  * Pattern dialect note: Spark compiles Java regex, the DuckDB oracle RE2.
  * Every pattern here stays inside the common subset with identical
  * semantics — character classes, bounded repetition, alternation,
  * non-capturing groups, `\b` — no lookaround, no backreferences.
  */
object Scrub {

  /** RFC-5322-ish practical email shape (the common-crawl heuristic, not
    * the full grammar). */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** http(s) URLs up to whitespace/quote delimiters; scheme matched
    * case-insensitively via `(?i:…)` (same syntax/semantics in Java regex
    * and RE2). */
  val UrlPattern: String = "(?i:https?)://[A-Za-z0-9._~:/?#@!$&*+,;=%-]+"

  /** Dotted-quad IPv4 (no octet-range refinement — scrubbing favors
    * recall; 999.0.0.1 redacts too). */
  val Ipv4Pattern: String = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** International `+CC ...` numbers and US-style `(555) 123-4567` /
    * `555-123-4567` shapes. */
  val PhonePattern: String =
    "\\+[0-9]{1,3}([-. ][0-9]{2,5}){1,4}|\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}"

  // ------------------------------------------------------------ detection

  def emails(text: Column): Column = regexp_extract_all(text, lit(EmailPattern), lit(0))
  def urls(text: Column): Column = regexp_extract_all(text, lit(UrlPattern), lit(0))
  def ipv4s(text: Column): Column = regexp_extract_all(text, lit(Ipv4Pattern), lit(0))
  def phones(text: Column): Column = regexp_extract_all(text, lit(PhonePattern), lit(0))

  def emailCount(text: Column): Column = size(emails(text))
  def urlCount(text: Column): Column = size(urls(text))
  def ipv4Count(text: Column): Column = size(ipv4s(text))
  def phoneCount(text: Column): Column = size(phones(text))

  /** Any PII hit at all (cheap pre-filter before the replace pass). */
  def hasPii(text: Column): Column =
    emailCount(text) > 0 || ipv4Count(text) > 0 || phoneCount(text) > 0

  // ------------------------------------------------------------ redaction

  def redactEmails(text: Column, token: String = "<EMAIL>"): Column =
    regexp_replace(text, lit(EmailPattern), lit(token))

  def redactUrls(text: Column, token: String = "<URL>"): Column =
    regexp_replace(text, lit(UrlPattern), lit(token))

  def redactIpv4(text: Column, token: String = "<IP>"): Column =
    regexp_replace(text, lit(Ipv4Pattern), lit(token))

  def redactPhones(text: Column, token: String = "<PHONE>"): Column =
    regexp_replace(text, lit(PhonePattern), lit(token))

  /** Full PII pass. Order matters (emails before phones keeps digit runs
    * inside addresses intact) — the oracle mirrors the same order. */
  def redactPii(text: Column): Column =
    redactPhones(redactIpv4(redactEmails(text)))

  // ------------------------------------------------------------ domains

  /** Registrable host of each URL in the text (scheme-stripped, userinfo
    * skipped, up to the first `/ : ? #`), lowercased. The optional
    * `user:pass@` segment must be consumed before the host capture —
    * otherwise "http://foo@blockedsite.com/" reads back "foo@…" and a
    * blocklist match silently fails. */
  def urlDomains(text: Column): Column =
    transform(urls(text), u =>
      lower(regexp_extract(u, "(?i:https?)://(?:[^/@?#]*@)?([^/:?#]+)", 1)))

  /** Canonical URL for URL-keyed dedup and grouping: lowercases the
    * scheme and host, strips the scheme's default port, drops the
    * fragment and the common tracking parameters (utm_*, fbclid, gclid,
    * msclkid), repairs the query separator if the first parameter was
    * removed, and trims trailing '?'/'&' and trailing slashes. Built
    * entirely from codegen'd regexp expressions — a scan-speed pass at
    * 100 TB; crawl dedup then groups on this column (e.g.
    * [[graft.pipeline.Dedup.exact]] with the canonical URL as the key). */
  def canonicalUrl(u: Column): Column = {
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostPort = lower(regexp_extract(rest, "^([^/?#]+)", 1))
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val pathQuery = regexp_extract(rest, "^[^/?#]+([^#]*)", 1)
    // tracking-parameter removal applies ONLY to the query string: split
    // at the first '?' so a literal '&utm_…' in the PATH (legal, and
    // explicitly distinct content) is never stripped
    val qPos = instr(pathQuery, "?")
    val pathOnly = when(qPos > 0, pathQuery.substr(lit(1), qPos - 1))
      .otherwise(pathQuery)
    val queryPart = when(qPos > 0,
      pathQuery.substr(qPos, length(pathQuery) - qPos + 1)).otherwise(lit(""))
    val cleanedQuery = regexp_replace(queryPart,
      "[?&](?:utm_[^=&#]*|fbclid|gclid|msclkid)=[^&#]*", "")
    // if the LEADING '?param' was removed, the first surviving '&'
    // becomes the new '?'
    val fixedQuery = when(cleanedQuery.substr(lit(1), lit(1)) === "&",
      concat(lit("?"), cleanedQuery.substr(lit(2), length(cleanedQuery))))
      .otherwise(cleanedQuery)
    val trimmed = regexp_replace(
      regexp_replace(concat(pathOnly, fixedQuery), "[?&]+$", ""), "/+$", "")
    // A scheme-less input has nothing to canonicalize against — pass it
    // through unchanged rather than emitting a malformed '://...' string.
    when(length(scheme) === 0, u)
      .otherwise(concat(scheme, lit("://"), host, trimmed))
  }

  /** Keep only documents whose URLs hit none of `blocked` (exact host
    * match, case-insensitive). Documents without URLs — including NULL
    * text, where the regexp extraction yields NULL — pass. A codegen'd
    * per-row filter — at 100 TB this is a scan-speed pass; for blocklists
    * beyond broadcast-literal size, join on an exploded domain column
    * instead. */
  def filterBlockedDomains(df: DataFrame, textCol: String,
      blocked: Seq[String]): DataFrame = {
    require(blocked.nonEmpty, "empty blocklist — nothing to filter")
    val blockedArr = array(blocked.map(d => lit(d.toLowerCase)): _*)
    df.filter(coalesce(!arrays_overlap(urlDomains(col(textCol)), blockedArr), lit(true)))
  }
}
