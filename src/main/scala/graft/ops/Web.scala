package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-crawl curation primitives: URL canonicalization, host/domain
  * extraction, per-domain quotas. Crawl-derived corpora key almost every
  * curation decision off the URL — exact dedup is "same canonical URL",
  * quotas are "at most N pages per registrable domain", and quality
  * priors attach to domains — so the canonicalizer must be deterministic
  * and engine-auditable, not a library black box.
  *
  * All parsing is RE2-portable regexp (no lookaround), the same
  * discipline as `TextAnalysis.scrubPii`, so the DuckDB oracle applies
  * the identical character-level rules. Spark's built-in `parse_url` is
  * the native alternative for host/path/query extraction, but its
  * semantics (null handling, bare-host URLs) cannot be reproduced
  * verbatim in the oracle engine — the explicit regexp chain is the
  * contract here, and it is what both engines run.
  */
object Web {

  private val schemePart = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"

  /** Lower-cased scheme, or empty when the value has none. */
  def urlScheme(u: Column): Column = lower(regexp_extract(u, schemePart, 1))

  /** Lower-cased `host[:port]` authority component. */
  private def hostPort(u: Column): Column =
    lower(regexp_extract(u, schemePart + "([^/?#]*)", 2))

  /** Canonical host: lower-cased, scheme-default port (`:80` http,
    * `:443` https) stripped, leading `www.` folded away.
    */
  def urlHost(u: Column): Column = {
    val hp = hostPort(u)
    val noPort =
      when(urlScheme(u) === "http", regexp_replace(hp, ":80$", ""))
        .when(urlScheme(u) === "https", regexp_replace(hp, ":443$", ""))
        .otherwise(hp)
    regexp_replace(noPort, "^www\\.", "")
  }

  /** Host reduced to its bare DNS name for domain-identity purposes:
    * userinfo (`user@`), ANY port (not just scheme defaults — a
    * non-default port is a real origin for `url_canon`, but
    * `spam.com:8080` is still the site `spam.com` to a blocklist or a
    * quota), and the FQDN trailing dot all stripped.
    */
  def bareHost(host: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(host,
      "^[^/@]*@", ""), ":[0-9]+$", ""), "\\.$", "")

  /** Registrable domain, last-two-labels heuristic (`a.b.c.com` →
    * `c.com`), over the [[bareHost]] form so ports/userinfo never split
    * domain identity. A full public-suffix-list resolver would treat
    * multi-label suffixes (`co.uk`) correctly; the PSL is a data file,
    * not an algorithm change — swap the regexp for a suffix-table join
    * to upgrade. Hosts with fewer than two labels pass through whole.
    */
  def registrableDomain(host: Column): Column = {
    val h = bareHost(host)
    when(h.rlike("[^.]+\\.[^.]+$"), regexp_extract(h, "([^.]+\\.[^.]+)$", 1))
      .otherwise(h)
  }

  /** Canonical path: duplicate slashes collapsed, trailing slash
    * stripped, empty path rendered as `/`.
    */
  private def urlPath(u: Column): Column = {
    val raw = regexp_extract(u, schemePart + "[^/?#]*([^?#]*)", 2)
    val collapsed = regexp_replace(raw, "/{2,}", "/")
    val stripped = regexp_replace(collapsed, "/+$", "")
    when(stripped === "", lit("/")).otherwise(stripped)
  }

  /** Canonical query string: split on `&`, drop empty params and
    * tracking params (`utm_*`, `fbclid`, `gclid`, `ref`), sort the
    * survivors (param order is transport noise), rejoin. Empty result →
    * empty string (no `?` in the canonical form). The match is anchored
    * to the PRE-FRAGMENT prefix (`^[^#]*`) — a `?` that first appears
    * inside the fragment (`/p#section?x=1`, hash-bang SPA routes) is
    * client-side state, not a query, and must not leak into the
    * canonical key.
    */
  private def urlQuery(u: Column): Column = {
    // `[^#?]*` anchors the delimiter to the FIRST pre-fragment '?'
    // (matching urlPath's stop): '?' is legal INSIDE a query string,
    // so the greedy `[^#]*\?` form would treat the LAST '?' as the
    // delimiter and silently drop `a=1?` from `/p?a=1?b=2`, collapsing
    // distinct URLs onto one canonical dedup key.
    val raw = regexp_extract(u, "^[^#?]*\\?([^#]*)", 1)
    val params = filter(split(raw, "&"),
      p => p =!= "" && !p.rlike("^(utm_[A-Za-z]*|fbclid|gclid|ref)="))
    array_join(array_sort(params), "&")
  }

  /** Canonical URL: `scheme://host path [?query]` from the pieces above;
    * the fragment never participates (`#...` is client-side only). Null
    * for values with no recognizable `scheme://host` — a row without a
    * parseable URL has no canonical identity, the same contract as
    * null keys in `Sampling.capPerGroup`.
    */
  def canonicalUrl(u: Column): Column = {
    val host = urlHost(u)
    val q = urlQuery(u)
    when(host === "" , lit(null).cast("string")).otherwise(
      concat(urlScheme(u), lit("://"), host, urlPath(u),
        when(q === "", lit("")).otherwise(concat(lit("?"), q))))
  }

  /** Attach `host`, `domain`, `url_canon` to `df`. Pure map-side
    * projection — a handful of regexp passes per row, no shuffle; at
    * 100 TB this rides the scan.
    */
  def canonicalize(df: DataFrame, urlCol: String): DataFrame = {
    val u = col(urlCol)
    df.withColumn("host", urlHost(u))
      .withColumn("domain", registrableDomain(urlHost(u)))
      .withColumn("url_canon", canonicalUrl(u))
  }

  /** Per-domain page quota over canonicalized rows — the crawl-corpus
    * "at most N pages per site" rule, delegated to
    * [[Sampling.capPerGroup]]'s hash-order contract (deterministic,
    * append-stable). One window per domain; skew ceiling is the hottest
    * domain, which is exactly what the cap bounds.
    */
  def capPerDomain(df: DataFrame, urlCol: String, keyCol: String,
                   maxPages: Int): DataFrame =
    Sampling.capPerGroup(canonicalize(df, urlCol), "domain", keyCol, maxPages)

  /** Minimal HTTP-response splitter — the step between "fetched bytes"
    * and [[TextAnalysis.stripHtml]] in a crawl pipeline (WARC response
    * records carry exactly this shape). Splits on the first blank line
    * (`\r\n` or bare `\n` — real crawls contain both), extracts the
    * status code and the `Content-Type` header's media type + charset.
    * RE2-portable regexps only; a payload with no blank line is all
    * headers and yields an empty body; a payload that is not an HTTP
    * response at all yields null status/type/charset (and, having no
    * header terminator, an empty body). Pure map-side.
    *
    * Adds: `status_code` (long), `content_type` (lower-cased media
    * type), `charset` (lower-cased, quotes stripped), `body`.
    */
  def parseHttp(df: DataFrame, rawCol: String): DataFrame = {
    val raw = col(rawCol)
    val statusS = regexp_extract(raw, "^HTTP/[0-9.]+ ([0-9]{3})", 1)
    val hasBlank = raw.rlike("\\r?\\n\\r?\\n")
    val hdr = when(hasBlank,
      regexp_extract(raw, "(?s)^(.*?)\\r?\\n\\r?\\n", 1)).otherwise(raw)
    val body = when(hasBlank,
      regexp_replace(raw, "(?s)^.*?\\r?\\n\\r?\\n", "")).otherwise(lit(""))
    val ct = lower(trim(regexp_extract(hdr,
      "(?im)^content-type:[ \\t]*([^\\r\\n;]+)", 1)))
    val cs = lower(regexp_extract(hdr,
      "(?im)^content-type:[^\\r\\n]*;[ \\t]*charset=[\"']?([A-Za-z0-9_.:-]+)", 1))
    df.withColumn("status_code", when(statusS =!= "", statusS.cast("long")))
      .withColumn("content_type", when(ct =!= "", ct))
      .withColumn("charset", when(cs =!= "", cs))
      .withColumn("body", body)
  }

  /** Every dot-suffix of a host that starts at a label boundary:
    * `a.b.c.com` → `[a.b.c.com, b.c.com, c.com, com]` — the match
    * keys for suffix-semantics blocklists.
    */
  def hostSuffixes(host: Column): Column = {
    val labels = split(host, "\\.")
    transform(sequence(lit(0), size(labels) - 1),
      i => array_join(slice(labels, i + 1, size(labels) - i), "."))
  }

  /** Domain-blocklist filter — the crawl-curation gate that removes
    * pages from known-bad sites. Suffix semantics: blocking `spam.com`
    * drops `spam.com` and every subdomain (`a.spam.com`), never
    * `notspam.com`. Rows whose URL has no parseable host pass through
    * (the blocklist speaks about hosts; hostless rows are the
    * quarantine path's concern, not this filter's).
    *
    * Scale posture: a blocklist is realistically millions of rows, so
    * the match must be an EQUI-join, not a per-row `LIKE` sweep: each
    * host explodes into its ≤|labels| suffixes, semi-joins the
    * blocklist on the suffix key (AQE broadcasts when the list is
    * small), and the hit keys anti-join back. No nested loop at any
    * blocklist size.
    *
    * Contract: `keyCol` must uniquely identify rows (the same contract
    * as [[Sampling.capPerGroup]]'s hash-rank key). The anti-join drops
    * every row CARRYING a hit key, so a non-unique key would silently
    * drop an unblocked row that happens to share its key with a
    * blocked one.
    */
  def filterBlockedDomains(df: DataFrame, urlCol: String, keyCol: String,
                           blocklist: DataFrame, blockedCol: String): DataFrame = {
    val b = blocklist.select(lower(col(blockedCol)).as("_blocked")).distinct()
    // match on the BARE host: 'spam.com:8080', 'x@spam.com' and
    // 'spam.com.' are all the blocked site, whatever the transport form
    val withHost = df.withColumn("_host", bareHost(urlHost(col(urlCol))))
    val hitKeys = withHost
      .select(col(keyCol), explode(hostSuffixes(col("_host"))).as("_sfx"))
      .join(b, col("_sfx") === col("_blocked"), "left_semi")
      .select(col(keyCol)).distinct()
    withHost.join(hitKeys, Seq(keyCol), "left_anti").drop("_host")
  }

  /** Meta-robots compliance: extract the `<meta name="robots">`
    * directive from raw HTML and flag `noindex` / `nofollow` (the
    * `none` shorthand implies both) — the legal/politeness gate a
    * crawl corpus must pass before training (a noindex page was
    * explicitly opted out by its publisher). Pure map-side regexp
    * program (RE2-portable, `(?i)` case folding, no lookaround);
    * `indexable` is the keep verdict.
    *
    * Two-stage extraction: first isolate the whole `<meta ...>` tag
    * whose attributes include `name="robots"`, then pull `content=`
    * out of that tag — HTML attribute order is free, so
    * `<meta content="noindex" name="robots">` and tags with
    * intervening attributes must gate identically to the
    * name-first form (a miss here fails open and trains on an
    * opted-out page).
    * Output: input columns + (robots_content, noindex, nofollow,
    * indexable).
    */
  def metaRobots(df: DataFrame, htmlCol: String): DataFrame = {
    val cols = df.columns.map(col).toSeq
    df.withColumn("_mr", metaRobotsStruct(col(htmlCol)))
      .select(cols :+ col("_mr.robots_content") :+ col("_mr.noindex") :+
        col("_mr.nofollow") :+ col("_mr.indexable"): _*)
  }

  /** The [[metaRobots]] kernel as ONE struct-typed Column shared with
    * the SQL macro `meta_robots(html)` (see
    * [[graft.functions.GraftExtensions]]) — pure-SQL gates evaluate the
    * bit-identical directive extraction the Scala pipeline runs.
    */
  def metaRobotsStruct(html: Column): Column = {
    val tagPat = "(?i)<meta\\b[^>]*name\\s*=\\s*[\"']robots[\"'][^>]*>"
    val tag = regexp_extract(html, tagPat, 0)
    val content = lower(regexp_extract(tag, "(?i)content\\s*=\\s*[\"']([^\"']*)[\"']", 1))
    val noindex = instr(content, "noindex") > 0 || instr(content, "none") > 0
    val nofollow = instr(content, "nofollow") > 0 || instr(content, "none") > 0
    struct(content.as("robots_content"), noindex.as("noindex"),
      nofollow.as("nofollow"), (!noindex).as("indexable"))
  }

  /** Per-domain reputation stats — the survey that MINES a blocklist
    * instead of consuming one: for each registrable domain, page
    * volume, distinct canonical URLs, exact-content duplication (ppm
    * of pages whose normalized text repeats within the domain), and
    * token mass. Domains with high dup_ppm are mirrors/SEO farms;
    * domains with huge n_pages and tiny n_canonical are
    * crawler traps — both are [[filterBlockedDomains]] feed.
    *
    * ONE map-side canonicalization pass, one (domain, fingerprint)
    * collapse, one domain agg — |domains| output rows, no joins back
    * to the corpus. All counts exact BIGINT; dup_ppm is BIGINT div.
    *
    * Output: (domain, n_pages, n_canonical, n_distinct_text,
    * dup_ppm, n_tokens).
    */
  def domainStats(df: DataFrame, urlCol: String, textCol: String): DataFrame = {
    val canon = canonicalize(
      df.filter(col(urlCol).isNotNull && col(textCol).isNotNull), urlCol)
      .filter(col("domain") =!= "")
      .select(col("domain"), col("url_canon"),
        TextAnalysis.fingerprint(col(textCol)).as("_fp"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("_nt"))
    canon.groupBy("domain")
      .agg(count(lit(1)).as("n_pages"),
        countDistinct(col("url_canon")).as("n_canonical"),
        countDistinct(col("_fp")).as("n_distinct_text"),
        sum(col("_nt")).as("n_tokens"))
      .withColumn("dup_ppm",
        expr("((n_pages - n_distinct_text) * 1000000L) div n_pages"))
      .select("domain", "n_pages", "n_canonical", "n_distinct_text",
        "dup_ppm", "n_tokens")
  }

  /** robots.txt rule extraction — the crawl-side compliance companion
    * to the page-side [[metaRobots]] gate. Parses the original REP
    * (prefix rules, `#` comments, consecutive `User-agent` lines
    * forming one group header) and keeps the Allow/Disallow rules of
    * every group whose header names `*`; named-agent-only groups are
    * out of scope by contract (a corpus crawler is nobody's special
    * agent), as are `*`/`$` wildcards (the 2022 RFC 9309 extension) —
    * prefix semantics only, the documented regime. Empty-prefix rules
    * drop (an empty Disallow allows everything; an empty Allow says
    * nothing). One domain-keyed window pass over line positions.
    * Output: (domain, rule 'allow'|'disallow', prefix) distinct.
    */
  def robotsRules(robots: DataFrame, domainCol: String,
                  txtCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("domain").orderBy("pos")
    val lines = robots
      .filter(col(domainCol).isNotNull && col(txtCol).isNotNull)
      .select(col(domainCol).as("domain"),
        posexplode(split(col(txtCol), "\r?\n")).as(Seq("pos", "_raw")))
      // comments strip BEFORE trimming: "Disallow: /x # note". The line
      // keeps its CASE: directive names are case-insensitive (the (?i)
      // patterns below) but rule PREFIXES are case-sensitive paths per
      // RFC 9309 — lowercasing them would fail the gate open on any
      // robots.txt with uppercase path characters
      .withColumn("_l", trim(regexp_replace(col("_raw"), "#.*$", "")))
    val isUa = col("_l").rlike("(?i)^user-agent:")
    val grouped = lines
      // a header RUN of consecutive user-agent lines opens one group
      .withColumn("_start",
        (isUa && !coalesce(lag(isUa, 1).over(w), lit(false))).cast("long"))
      .withColumn("_g", sum(col("_start")).over(w))
    val starGroups = grouped
      .filter(isUa &&
        trim(regexp_extract(col("_l"), "(?i)^user-agent:\\s*(\\S*)", 1)) === "*")
      .select(col("domain"), col("_g")).distinct()
    grouped
      .withColumn("rule",
        lower(regexp_extract(col("_l"), "(?i)^(allow|disallow):", 1)))
      .withColumn("prefix",
        trim(regexp_extract(col("_l"), "(?i)^(allow|disallow):\\s*(\\S*)", 2)))
      .filter(col("rule") =!= "" && col("prefix") =!= "")
      .join(starGroups, Seq("domain", "_g"))
      .select("domain", "rule", "prefix").distinct()
  }

  /** Evaluate URLs against [[robotsRules]] by the REP longest-match
    * rule: among rules whose prefix starts the URL path, the LONGEST
    * prefix wins; on equal length Allow beats Disallow (Google's
    * documented tie-break); no matching rule means allowed. Matching
    * runs on the RAW path (empty → `/`), NOT [[urlPath]]'s
    * dedup-canonical form — stripping a trailing slash would unmatch
    * the `Disallow: /dir/` directory idiom, the most common rule shape,
    * and REP matching is byte-literal. The join is domain-keyed
    * (per-domain rule sets are tens of rows), the winner is one
    * min-struct aggregate — no window.
    * Output: (url, domain, path, matched_rule, matched_prefix,
    * allowed).
    */
  def robotsAllowed(urls: DataFrame, rules: DataFrame,
                    urlCol: String): DataFrame = {
    val rawPath = regexp_extract(col(urlCol), schemePart + "[^/?#]*([^?#]*)", 2)
    val u = urls.filter(col(urlCol).isNotNull)
      .select(col(urlCol).as("url"), urlHost(col(urlCol)).as("domain"),
        when(rawPath === "", lit("/")).otherwise(rawPath).as("path"))
    val matched = u.join(rules, Seq("domain"))
      .filter(col("path").startsWith(col("prefix")))
      .groupBy("url", "domain", "path")
      .agg(min(struct((-length(col("prefix"))).as("_nl"),
        // allow sorts before disallow at equal length: 0 < 1
        when(col("rule") === "allow", 0).otherwise(1).as("_p"),
        col("rule").as("_r"), col("prefix").as("_pr"))).as("_best"))
      .select(col("url"), col("domain"), col("path"),
        col("_best").getField("_r").as("matched_rule"),
        col("_best").getField("_pr").as("matched_prefix"))
    u.join(matched, Seq("url", "domain", "path"), "left")
      .select(col("url"), col("domain"), col("path"),
        coalesce(col("matched_rule"), lit("")).as("matched_rule"),
        coalesce(col("matched_prefix"), lit("")).as("matched_prefix"),
        (coalesce(col("matched_rule"), lit("allow")) === "allow")
          .as("allowed"))
  }
}
