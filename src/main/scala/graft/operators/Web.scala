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

  /** Userinfo (`user:pass@`), shared by [[HostPattern]] and
    * [[withCanonicalUrl]]. Must stop at `? #` as well as `/` — with the
    * looser `[^/@]*@`, a path-less URL carrying '@' in a QUERY value
    * (`http://x.com?to=a@b`) would mis-read everything up to that '@'
    * as userinfo and report the wrong host. */
  private[operators] val UserinfoPattern = "(?:[^/?#@]*@)?"

  /** Host extraction: optional scheme, optional userinfo, then
    * everything up to the first `/ : ? #`. Ports and paths excluded. */
  val HostPattern =
    s"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?$UserinfoPattern([^/:?#]+)"

  /** Lowercased host of a URL-ish string ('' when nothing matches). */
  def host(url: Column): Column =
    lower(regexp_extract(url, HostPattern, 1))

  /** Registered domain, last-two-labels heuristic: `a.b.example.com` →
    * `example.com`; dotless hosts (localhost, bare names) pass through.
    * A public-suffix list refines multi-label TLDs (`co.uk`) — see the
    * PSL overload; the list itself is deliberately NOT bundled: it is
    * data, not logic, and ships per-deployment. */
  def registeredDomain(url: Column): Column = {
    val h = host(url)
    coalesce(nullif(regexp_extract(h, "([^.]+\\.[^.]+)$", 1), lit("")), h)
  }

  /**
   * Registered domain under a public-suffix list: the LONGEST suffix in
   * `psl` matching the host's trailing labels wins, and the registered
   * domain is that suffix plus one label (`www.bbc.co.uk` with `co.uk`
   * listed → `bbc.co.uk`). Hosts no PSL entry matches fall back to the
   * last-two-labels heuristic (the PSL's own prevailing-`*` rule), and a
   * host that IS a public suffix passes through unchanged.
   *
   * Exact suffixes only: wildcard (`*.ck`) and exception (`!www.ck`)
   * rules are rejected loudly — pre-expand them when preparing the
   * deployment list. Membership compiles to `InSet` (hash-set lookup,
   * codegen'd) per suffix depth, so the whole thing stays a scan-stage
   * projection: no join, no shuffle, 100 TB-safe. Load a table-shaped
   * list via [[pslFromTable]].
   */
  def registeredDomain(url: Column, psl: Seq[String]): Column =
    domainOfHost(host(url), normalizePsl(psl))

  /** PSL longest-match over an ALREADY-extracted host column (used by
    * [[withUrlParts]] so the host regex runs once, not per depth). */
  private def domainOfHost(h: Column, entries: Seq[String]): Column = {
    val labels = split(h, "\\.")
    val n = size(labels)
    def lastLabels(k: Int): Column = concat_ws(".", slice(labels, -k, k))
    val heuristic =
      coalesce(nullif(regexp_extract(h, "([^.]+\\.[^.]+)$", 1), lit("")), h)
    // longest suffix depth first; each depth is one InSet membership test
    entries.groupBy(_.count(_ == '.') + 1).toSeq.sortBy(-_._1)
      .foldLeft(Option.empty[Column]) { case (rest, (k, es)) =>
        val hit = (n > k) && lastLabels(k).isin(es: _*)
        Some(rest.fold(when(hit, lastLabels(k + 1)))(
          r => r.when(hit, lastLabels(k + 1))))
      }
      .fold(heuristic)(_.otherwise(heuristic))
  }

  /** Validate + normalize a public-suffix list (lowercase, distinct;
    * loud rejection of wildcard/exception rules and malformed entries). */
  private def normalizePsl(psl: Seq[String]): Seq[String] = {
    require(psl.nonEmpty, "empty public-suffix list")
    val entries = psl.map(_.trim.toLowerCase).distinct
    val malformed = entries.filter(e =>
      e.isEmpty || e.startsWith(".") || e.endsWith(".") || e.contains(".."))
    require(malformed.isEmpty,
      s"malformed public-suffix entries: ${malformed.mkString(", ")}")
    val rules = entries.filter(e => e.contains("*") || e.contains("!"))
    require(rules.isEmpty,
      s"wildcard/exception PSL rules are not supported — pre-expand them " +
        s"into exact suffixes: ${rules.mkString(", ")}")
    val deep = entries.filter(_.count(_ == '.') >= 8)
    require(deep.isEmpty, s"implausibly deep suffix entries: ${deep.mkString(", ")}")
    entries
  }

  /** Driver-side reference of the same longest-match rule — used to
    * validate blocklist entries and by specs; keep in lockstep with
    * [[domainOfHost]]. */
  private[graft] def registeredDomainJvm(host: String, psl: Seq[String]): String = {
    val entries = normalizePsl(psl)
    val h = host.toLowerCase
    val labels = h.split("\\.", -1)
    val set = entries.toSet
    val depths = entries.map(_.count(_ == '.') + 1).distinct.sorted.reverse
    depths.find(k => labels.length > k && set.contains(labels.takeRight(k).mkString("."))) match {
      case Some(k) => labels.takeRight(k + 1).mkString(".")
      case None if labels.length >= 2 => labels.takeRight(2).mkString(".")
      case None => h
    }
  }

  /** Collect a table-shaped public-suffix list for the PSL operators.
    * The PSL is deployment data at metadata scale (~10k rows), so the
    * collect is driver-safe — the same economics as the bloom-filter
    * literal and the rebalance strata counts; the resulting literal set
    * is embedded in the plan and shipped with the task closure (no
    * join, no shuffle against the corpus). */
  def pslFromTable(psl: DataFrame, suffixCol: String = "suffix"): Seq[String] = {
    val rows = psl.select(col(suffixCol).cast("string")).distinct()
      .collect().map(_.getString(0))
    normalizePsl(rows.toSeq)
  }

  /**
   * (input columns +) `host`, `domain` — one projection, the regex
   * evaluated on the raw column (cheap enough that materializing the
   * host first would save one regex at the cost of a wider row).
   */
  def withUrlParts(df: DataFrame, urlCol: String): DataFrame = {
    Cols.requireAbsent(df, "host", "domain")
    df.withColumn("host", host(col(urlCol)))
      .withColumn("domain", registeredDomain(col(urlCol)))
  }

  /** [[withUrlParts]] with PSL-aware domains; the host materializes
    * first so the extraction regex runs once, not once per PSL depth. */
  def withUrlParts(df: DataFrame, urlCol: String, psl: Seq[String]): DataFrame = {
    Cols.requireAbsent(df, "host", "domain")
    df.withColumn("host", host(col(urlCol)))
      .withColumn("domain", domainOfHost(col("host"), normalizePsl(psl)))
  }

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

  /**
   * PSL-aware blocklist: like the heuristic form, but `bbc.co.uk`-shaped
   * entries actually work — every entry must itself be a registered
   * domain UNDER THE GIVEN PSL (`example.co.uk` passes with `co.uk`
   * listed; `ads.sub.example.com` is rejected loudly because it could
   * never equal any row's registered domain).
   */
  def dropBlockedDomains(
    df: DataFrame,
    urlCol: String,
    blocked: Seq[String],
    psl: Seq[String]
  ): DataFrame = {
    require(blocked.nonEmpty, "empty blocklist — nothing would be dropped")
    val entries = blocked.map(_.toLowerCase)
    val unmatchable = entries.filter(e => registeredDomainJvm(e, psl) != e)
    require(unmatchable.isEmpty,
      s"blocklist entries that are not registered domains under the given " +
        s"PSL can never match: ${unmatchable.mkString(", ")} — list the " +
        "registered domain instead")
    df.filter(coalesce(
      !domainOfHost(host(col(urlCol)), normalizePsl(psl)).isin(entries: _*),
      lit(true)))
  }

  /** Tracking query parameters dropped by [[withCanonicalUrl]] —
    * analytics/click-id noise that splinters one page into many URLs. */
  val TrackingParamPattern: String =
    "utm_[^&=]*|gclid|fbclid|msclkid|mc_eid"

  /**
   * URL canonicalization for URL-level dedup and provenance joins: the
   * same page crawled as `HTTP://Example.com:80/a?utm_source=x#top` and
   * `http://example.com/a` must produce ONE canonical key. Steps, in
   * order:
   *
   *   1. drop the fragment (`#…` — client-side only)
   *   2. drop tracking parameters ([[TrackingParamPattern]]), then
   *      repair delimiters (`?&&x` → `?x`, trailing `?`/`&` dropped)
   *   3. lowercase the scheme and authority (path/query stay
   *      case-sensitive per RFC 3986; any userinfo is lowercased with
   *      the authority — crawl URLs don't carry credentials) and strip
   *      default ports (`:80` for http, `:443` for https — other
   *      ports kept)
   *
   * Trailing-slash and path normalization are deliberately OUT of
   * scope (`/a` vs `/a/` can be different resources). Non-URL strings
   * degrade gracefully (no scheme/host match → steps 1-2 still apply);
   * NULL propagates. All regex is Java/RE2 common-subset; the pieces
   * materialize as columns so nothing is re-derived per reference.
   */
  def withCanonicalUrl(
    df: DataFrame, urlCol: String, outCol: String = "canonical_url"
  ): DataFrame = {
    Cols.requireAbsent(df, outCol, "__cu_nofrag", "__cu_clean", "__cu_pre", "__cu_hp")
    df
      // step 1: drop the fragment, then SPLIT at the first '?' — the
      // tracking-param pass must only ever see the query ('&' is a legal
      // path sub-delimiter; an unrestricted pass would delete real path
      // content like /a&utm_b=2/more)
      .withColumn("__cu_nofrag", regexp_replace(col(urlCol), "#.*", ""))
      // step 2 over the query alone: drop tracking params with
      // case-insensitive NAMES (values stay case-sensitive), keeping the
      // leading delimiter via $1 so a kept param after a dropped one
      // stays attached; then delimiter repair: && runs collapse, ?&
      // heals, trailing ?/& drops
      .withColumn("__cu_clean",
        concat(
          regexp_replace(col("__cu_nofrag"), "\\?.*", ""),
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_extract(col("__cu_nofrag"), "\\?.*", 0),
                  s"([?&])(?i:$TrackingParamPattern)=[^&]*", "$1"),
                "&&+", "&"),
              "\\?&", "?"),
            "[?&]+$", "")))
      // scheme://userinfo@ prefix and host[:port], materialized once
      .withColumn("__cu_pre",
        regexp_extract(col("__cu_clean"),
          s"^([a-zA-Z][a-zA-Z0-9+.-]*://$UserinfoPattern)", 1))
      .withColumn("__cu_hp",
        regexp_extract(
          substring(col("__cu_clean"), length(col("__cu_pre")) + 1, lit(1000000)),
          "^([^/?#]*)", 1))
      .withColumn(outCol, {
        val lowerPre = lower(col("__cu_pre"))
        val hp = lower(col("__cu_hp"))
        val noPort = when(lowerPre.startsWith("http://") && hp.endsWith(":80"),
            regexp_replace(hp, ":80$", ""))
          .when(lowerPre.startsWith("https://") && hp.endsWith(":443"),
            regexp_replace(hp, ":443$", ""))
          .otherwise(hp)
        concat(lowerPre, noPort,
          substring(col("__cu_clean"),
            length(col("__cu_pre")) + length(col("__cu_hp")) + 1, lit(1000000)))
      })
      .drop("__cu_nofrag", "__cu_clean", "__cu_pre", "__cu_hp")
  }

  /**
   * HTML → text: drop script/style blocks and comments wholesale, strip
   * the remaining tags, then decode the six dominant entities — the
   * crawl-to-corpus extraction step that precedes every other text
   * operator here. Four codegen'd regexp passes + six literal replaces,
   * all in the scan projection; patterns are Java-regex/RE2
   * common-subset (inline `(?is)` flags + non-greedy, no lookaround),
   * so the DuckDB oracle re-derives every byte.
   *
   * The tag pass is LETTER-ANCHORED — `<[/!]?[a-zA-Z][^>]*>`, never a
   * bare `<[^>]+>` — so unescaped inequalities in prose ("1<2 but
   * 5>3") survive instead of being swallowed as a pseudo-tag; the
   * standard lossy-extraction heuristic, spec-pinned.
   *
   * Entity decode order is load-bearing: specific entities first and
   * `&amp;` LAST, so double-escaped text decodes exactly ONE level
   * (`&amp;lt;` → `&lt;`, never `<`) — the single-pass HTML semantic.
   * Escaped markup in the source (`&lt;b&gt;`) therefore survives as
   * visible text `<b>`, matching what a browser renders. Numeric
   * entities beyond `&#39;` and named entities beyond these six pass
   * through untouched (documented scope, not a TODO: full entity
   * tables are data, like the PSL). NULL propagates.
   */
  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[/!]?[a-zA-Z][^>]*>", " ")
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (from, to)) =>
        replace(acc, lit(from), lit(to))
      }
  }

  // ------------------------------------------------------------- links

  /** One `<a ...>anchor</a>` match: href attribute (either quote style)
    * and inner text. Case-insensitive; DOTALL for multi-line anchors. */
  private val AnchorRegex =
    """(?is)<a\s[^>]*href\s*=\s*["']([^"'#][^"']*)["'][^>]*>(.*?)</a>"""

  /**
   * Out-link extraction from raw HTML — the edge-list feeder for the
   * link-graph operators ([[Graph.pageRank]] / [[Graph
   * .labelPropagation]]) and the step after [[graft.sources.Warc
   * .readWarc]] in a crawl pipeline: one row per `<a href>` with the
   * RESOLVED absolute URL and the tag's anchor text (stripped via
   * [[stripHtml]]).
   *
   * Resolution (RFC 3986-lite, pure Column expressions — row-local,
   * zero shuffle, streaming-safe): absolute `scheme://` hrefs pass
   * through; `//host/...` adopts the base scheme; `/path` adopts the
   * base origin; other hrefs resolve against the base DIRECTORY with
   * `.`/`..` segment normalization (an aggregate fold over the path
   * segments — no UDF). Fragment-only and `javascript:`/`mailto:`
   * pseudo-links are skipped by the href pattern (`#`-first) or the
   * scheme check. NULL html/base → no rows.
   *
   * Scale shape: regexp_extract_all + a per-match projection — a pure
   * scan-stage explode, the only shuffle is whatever the caller
   * aggregates next (e.g. groupBy domain for the page graph).
   */
  def extractLinks(
    df: DataFrame,
    htmlCol: String,
    baseUrlCol: String
  ): DataFrame = {
    val html = col(htmlCol)
    val base = col(baseUrlCol)
    val matches = regexp_extract_all(html, lit(AnchorRegex), lit(0))
    val exploded = df
      .filter(html.isNotNull && base.isNotNull)
      .select(df.columns.map(col) :+ explode(matches).as("__a"): _*)
    val href = regexp_extract(col("__a"), AnchorRegex, 1)
    val anchor = trim(regexp_replace(stripHtml(regexp_extract(col("__a"), AnchorRegex, 2)),
      "\\s+", " "))
    // base decomposition: scheme, origin (scheme://host[:port]), directory
    val scheme = regexp_extract(base, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)
    val origin = regexp_extract(base, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    // base path: strip query/fragment, then everything after the last /
    val basePath = regexp_extract(base, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val baseDir = when(basePath === "", lit("/"))
      .otherwise(regexp_replace(basePath, "[^/]*$", ""))
    val isAbsolute = href.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://")
    val isPseudo = href.rlike("^(?i)(javascript|mailto|tel|data):")
    val isProtoRel = href.startsWith("//")
    val isRootRel = href.startsWith("/") && !isProtoRel
    // merge dir + relative href, normalize . and .. segments with a fold
    val merged = concat(baseDir, href)
    val segs = split(regexp_replace(merged, "[?#].*$", ""), "/")
    val normSegs = aggregate(segs, array().cast("array<string>"),
      (acc, s) =>
        when(s === "." || s === "", acc)
          .when(s === "..",
            when(size(acc) > 0, slice(acc, lit(1), size(acc) - 1)).otherwise(acc))
          .otherwise(concat(acc, array(s))))
    val suffix = regexp_extract(merged, "([?#].*)$", 1)
    val relative = concat(origin, lit("/"), array_join(normSegs, "/"), suffix)
    val resolved =
      when(isPseudo, lit(null).cast("string"))
        .when(isAbsolute, href)
        .when(isProtoRel, concat(scheme, lit(":"), href))
        .when(isRootRel, concat(origin, href))
        .otherwise(when(origin === "", lit(null).cast("string")).otherwise(relative))
    exploded
      .withColumn("link_url", resolved)
      .withColumn("anchor_text", anchor)
      .filter(col("link_url").isNotNull)
      .drop("__a")
  }
}
