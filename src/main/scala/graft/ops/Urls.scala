package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL canonicalization and domain-level curation — the Common Crawl
  * follow-on to [[Sources.readWetDocs]]: crawl corpora are keyed by URL,
  * and both dedup ("the same page fetched twice") and quality control
  * ("cap or score whole domains") operate on a CANONICAL form of it.
  *
  * Everything here is row-local column arithmetic (regex decomposition,
  * no UDF, no driver state) plus at most ONE key shuffle per operator —
  * groupBy for dedup/stats (map-side partial aggregation, so a hot
  * domain's rows combine before the exchange), a domain-partitioned
  * window for the per-domain cap (exact rank semantics; NOTE the one
  * skew caveat on [[capPerDomain]]).
  *
  * The normalization is deliberately RULE-BASED and engine-portable
  * (each rule is one regex both Spark and DuckDB replay exactly —
  * that's what makes the gates hash-exact); it is the common
  * canonical-form subset (case, fragments, default ports, www, trailing
  * slashes), not a full WHATWG URL parser.
  */
object Urls {

  /** Canonical form of a URL:
    *   1. fragment stripped (`#...` never reaches the server);
    *   2. scheme://authority lowercased (case-insensitive per RFC 3986;
    *      path and query keep their case — those ARE case-sensitive);
    *   3. default ports dropped (`http://…:80`, `https://…:443`);
    *   4. a leading `www.` host label dropped;
    *   5. trailing path slashes dropped.
    * A value with no `scheme://` authority falls back to trimmed
    * lowercase with the same fragment/slash rules (graceful on urns and
    * bare hosts). NULL stays NULL. */
  def normalizeUrl(url: Column): Column = {
    val u = regexp_replace(trim(url), "#.*$", "")
    val prefix = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    val rest = regexp_replace(u.substr(length(prefix) + lit(1), length(u)),
      "/+$", "")
    val p = regexp_replace(
      regexp_replace(
        regexp_replace(lower(prefix), "^(http://.*):80$", "$1"),
        "^(https://.*):443$", "$1"),
      "://www\\.", "://")
    when(url.isNull, lit(null))
      .when(prefix === "", regexp_replace(lower(u), "/+$", ""))
      .otherwise(concat(p, rest))
  }

  /** Host of a NORMALIZED url: the authority with any userinfo and port
    * stripped (already lowercase after [[normalizeUrl]]). Empty string
    * when the value has no `scheme://` authority. */
  def hostOf(normUrl: Column): Column =
    regexp_extract(normUrl, "^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)", 1)

  /** Domain-blocklist filter: drop every document whose host IS a
    * blocked domain or is a SUBDOMAIN of one (`ads.example.com` falls
    * to a block on `example.com`) — the curation pass that applies a
    * spam/adult/malware domain list to a crawl.
    *
    * Suffix matching is row-local, no shuffle and no join: the whole
    * blocklist compiles to ONE anchored alternation `(^|\.)(d1|d2|…)$`
    * matched against the host — a single automaton per row, and the
    * host expression is evaluated ONCE per row (the null check rides
    * the raw url column; normalization is null-preserving). The shape
    * is deliberate, measured on the gate corpus: a dot-suffix explode
    * (`transform`/`slice`/`arrays_overlap`) uses higher-order
    * functions, which are CodegenFallback — the pushed-down predicate
    * dropped the whole filter out of whole-stage codegen and re-ran
    * the inlined normalization tree interpreted once per suffix; an
    * `EndsWith` OR-chain stayed compiled but still re-evaluated the
    * host 2·|blocklist| times. One regex, one evaluation. Fine through
    * ~10³ entries as a plan constant; a PSL-scale list (10⁵) switches
    * to a broadcast semi-join on exploded host suffixes, same
    * semantics. Rows with no authority (empty host) match nothing and
    * are KEPT — blocklists name domains, not schemeless ids.
    *
    * `assumeNormalized` skips the canonicalization when `urlCol`
    * already holds [[normalizeUrl]] output — the real 100 TB shape:
    * normalize ONCE upstream, let dedup/stats/cap/blocklist all
    * consume the stored canonical form. */
  def filterBlockedDomains(df: DataFrame, urlCol: String,
      blocked: Seq[String], assumeNormalized: Boolean = false): DataFrame = {
    require(blocked.nonEmpty, "empty blocklist — nothing to filter")
    require(blocked.forall(d => d != null && d.nonEmpty),
      "blocklist entries must be non-empty domains")
    val norm = if (assumeNormalized) col(urlCol) else normalizeUrl(col(urlCol))
    val pat = "(^|\\.)(" +
      blocked.map(_.toLowerCase).distinct
        .map(java.util.regex.Pattern.quote).mkString("|") + ")$"
    df.filter(col(urlCol).isNull || !hostOf(norm).rlike(pat))
  }

  /** Registrable-domain heuristic of a NORMALIZED url: the last two
    * host labels (`news.bbc.co.uk` → `co.uk` — the documented
    * no-public-suffix-list trade; swap in a PSL lookup table via a
    * broadcast join when precision matters), the whole host when it has
    * a single label or is an IPv4 literal's tail. Empty string when the
    * value has no authority. */
  def domainOf(normUrl: Column): Column = {
    val host = hostOf(normUrl)
    val twoLabel = regexp_extract(host, "[^.]+\\.[^.]+$", 0)
    when(twoLabel === "", host).otherwise(twoLabel)
  }

  /** Exact URL-level dedup: one row per canonical URL — the smallest
    * `idCol` wins (deterministic on any partitioning), with the
    * duplicate multiplicity kept for frequency stats. ONE map-side-
    * combined groupBy on the canonical form; null URLs drop (no key,
    * no identity — same rule as [[Dedup]]'s text dedup). */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.filter(col(urlCol).isNotNull)
      .groupBy(normalizeUrl(col(urlCol)).as("url_norm"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))
      .select(idCol, "url_norm", "n_dups")

  /** Per-domain corpus stats — the frequency/quality view a crawl
    * curation pass ranks domains by: document count, total whitespace
    * tokens, and the quality-score mass as an INTEGER sum of 4-dp-
    * scaled scores (integer addition commutes, so the result is
    * bit-identical under any partitioning/engine — a double `avg`
    * would drift in the last ulp with the summation order; divide by
    * `n_docs` at read time for the mean). ONE shuffle, partial-agg'd
    * map-side. */
  def domainQualityStats(df: DataFrame, urlCol: String,
      textCol: String): DataFrame =
    df.filter(col(urlCol).isNotNull)
      .select(domainOf(normalizeUrl(col(urlCol))).as("domain"),
        TextAnalysis.tokenCount(col(textCol)).as("__t"),
        (round(TextAnalysis.qualityScore(col(textCol)) * 10000)
          .cast("long")).as("__q4"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__t").cast("long")).as("tok_sum"),
        sum(col("__q4")).as("q4_sum"))

  /** Domain balancing: keep at most `maxPerDomain` documents per
    * registrable domain, chosen by a salted-hash rank of the doc id —
    * deterministic on any cluster/partitioning (same hash contract as
    * [[Sampling.mixtureSample]]), so reruns keep the SAME documents.
    * One domain-partitioned rank window; a mega-domain (half the crawl
    * under one registrable domain) sorts through one task — pre-split
    * such corpora on a finer key (host, not registrable domain) or
    * pre-filter with a cheap count if that skew is real in your data. */
  def capPerDomain(df: DataFrame, idCol: String, urlCol: String,
      maxPerDomain: Int, salt: String = "domcap"): DataFrame = {
    require(maxPerDomain >= 1, s"maxPerDomain must be >= 1, got $maxPerDomain")
    require(!df.columns.contains("domain") && !df.columns.contains("__r"),
      "input already has a 'domain'/'__r' column — rename it before capPerDomain")
    val w = Window.partitionBy(col("domain"))
      .orderBy(Sampling.hashBucket(col(idCol), salt).asc, col(idCol).asc)
    df.filter(col(urlCol).isNotNull)
      .withColumn("domain", domainOf(normalizeUrl(col(urlCol))))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= maxPerDomain)
      .drop("__r")
  }
}
