package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Web-provenance operators for corpus curation: URL decomposition and
 * domain blocklists — the provenance half of the filtering recipes
 * (per-domain budgets pair with [[Sampling.topKBy]], blocklists with
 * [[Web.dropBlockedDomains]]).
 *
 * Everything is a codegen'd regex projection (patterns chosen to mean
 * the same thing in Java regex and RE2: no backrefs, no lookaround —
 * the PII-scrub portability rule), so provenance extraction rides the
 * scan at corpus scale; the blocklist is a literal IN-filter for
 * list-sized sets, or an anti-join for table-sized ones.
 */
object Web {

  /** Host extraction: optional scheme, optional userinfo, then
    * everything up to the first `/ : ? #`. Ports and paths excluded. */
  val HostPattern = "^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@]*@)?([^/:?#]+)"

  /** Lowercased host of a URL-ish string ('' when nothing matches). */
  def host(url: Column): Column =
    lower(regexp_extract(url, HostPattern, 1))

  /** Registered domain, last-two-labels heuristic: `a.b.example.com` →
    * `example.com`; dotless hosts (localhost, bare names) pass through.
    * A public-suffix list would refine multi-label TLDs (`co.uk`) —
    * deliberately NOT bundled: it is data, not logic, and ships
    * per-deployment. */
  def registeredDomain(url: Column): Column = {
    val h = host(url)
    coalesce(nullif(regexp_extract(h, "([^.]+\\.[^.]+)$", 1), lit("")), h)
  }

  /**
   * (input columns +) `host`, `domain` — one projection, the regex
   * evaluated on the raw column (cheap enough that materializing the
   * host first would save one regex at the cost of a wider row).
   */
  def withUrlParts(df: DataFrame, urlCol: String): DataFrame =
    df.withColumn("host", host(col(urlCol)))
      .withColumn("domain", registeredDomain(col(urlCol)))

  /**
   * Drops rows whose registered domain is on the blocklist (case-
   * insensitive). Rows with a NULL URL are KEPT — a blocklist only
   * removes known-bad provenance, and NULL means unknown (without the
   * explicit coalesce, the three-valued `NOT IN` would silently drop
   * them). Entries must be registered domains under the same
   * last-two-labels heuristic as [[registeredDomain]] — a deeper entry
   * like `ads.sub.example.com` could never match and is rejected
   * loudly rather than silently ignored.
   *
   * A literal IN-filter: right for curated lists up to thousands of
   * entries (it codegens into the scan); for table-sized blocklists
   * join `withUrlParts(df, u)` against the list with `left_anti` on
   * `domain` instead.
   */
  def dropBlockedDomains(
    df: DataFrame,
    urlCol: String,
    blocked: Seq[String]
  ): DataFrame = {
    require(blocked.nonEmpty, "empty blocklist — nothing would be dropped")
    val entries = blocked.map(_.toLowerCase)
    entries.filter(_.count(_ == '.') > 1) match {
      case Nil =>
      case deep => throw new IllegalArgumentException(
        s"blocklist entries deeper than a registered domain can never match " +
          s"the last-two-labels heuristic: ${deep.mkString(", ")} — " +
          "list the registered domain (e.g. 'example.com') instead")
    }
    df.filter(coalesce(
      !registeredDomain(col(urlCol)).isin(entries: _*),
      lit(true)))
  }
}
