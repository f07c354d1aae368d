package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and per-domain curation — the provenance half of
  * web-corpus cleaning (C4/RefinedWeb-style pipelines dedup and cap by
  * canonical URL/domain before any content pass, because crawl frontiers
  * revisit the same page under utm-decorated, fragment-bearing, case-
  * mangled variants). Engine addition: the reference has no URL family.
  *
  * Everything is a pure per-row expression chain (codegen'd, zero
  * shuffle until the explicit aggregations), built from string/array
  * functions whose semantics are identical in DuckDB — the oracle
  * replays split/filter/sort/join step for step.
  *
  * Canonical form (documented contract, each step exercised by fixture):
  *  - scheme and host lowercased; a leading `www.` dropped
  *  - fragment (`#...`) dropped
  *  - tracking params dropped: `utm_*`, `gclid`, `fbclid`, `ref`
  *  - surviving query params sorted (param order never distinguishes
  *    pages for dedup purposes; sorting makes the form canonical)
  *  - empty path becomes `/`; a trailing `/` on a non-root path drops
  * Precondition: absolute http(s) URLs (`scheme://host[/path][?q][#f]`).
  */
object UrlOps {

  private val trackRe = "^(utm_[a-z]+|gclid|fbclid|ref)(=|$)"

  /** Canonical URL column (see object doc for the exact contract). */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val base = substring_index(noFrag, "?", 1)
    val query = when(noFrag.contains("?"), substring_index(noFrag, "?", -1))
      .otherwise(lit(""))
    val scheme = lower(substring_index(base, "://", 1))
    val rest = substring_index(base, "://", -1)
    val hostRaw = lower(substring_index(rest, "/", 1))
    val host = when(hostRaw.startsWith("www."), substring(hostRaw, 5, 1 << 24))
      .otherwise(hostRaw)
    val pathRaw = substring(rest, length(hostRaw) + 1, lit(1 << 24))
    val path0 = when(pathRaw === "", lit("/")).otherwise(pathRaw)
    val path = when(path0 =!= "/" && path0.endsWith("/"),
      path0.substr(lit(1), length(path0) - 1))
      .otherwise(path0)
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(trackRe))
    val sortedQ = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(sortedQ =!= "", concat(lit("?"), sortedQ)).otherwise(lit("")))
  }

  /** Registrable-domain approximation: the last two host labels
    * (`a.b.example.com` → `example.com`). A production system substitutes
    * the public-suffix list; the aggregation shapes are identical. */
  def registrableDomain(url: Column): Column = {
    val rest = substring_index(substring_index(url, "://", -1), "/", 1)
    val host = lower(substring_index(rest, ":", 1))
    val labels = split(host, "\\.")
    array_join(slice(labels, greatest(size(labels) - 1, lit(1)), lit(2)), ".")
  }

  /** Blocklist filter over CANONICAL urls: drop any document whose
    * canonicalized URL matches one of the `patterns` (regexes from the
    * Java/RE2-common subset — the form domain blocklists compile to).
    * Patterns fold into one alternation, so the filter is a single
    * codegen'd rlike per row; tag mirrors the engine's O/N convention
    * ("O" = blocked). */
  def urlBlocklist(docs: DataFrame, urlCol: String,
      patterns: Seq[String]): DataFrame = {
    require(patterns.nonEmpty, "urlBlocklist needs at least one pattern")
    val combined = patterns.mkString("(", ")|(", ")")
    docs.withColumn("canon_url", canonicalizeUrl(col(urlCol)))
      .withColumn("blocked", col("canon_url").rlike(combined))
      .withColumn("tag", when(col("blocked"), "O").otherwise("N"))
  }

  /** Per-domain corpus accounting: docs, chars, distinct languages —
    * the report that decides crawl-source quotas. One hash aggregate
    * (map-side combined), domain-cardinality-sized output. */
  def domainStats(docs: DataFrame, urlCol: String, textCol: String,
      langCol: String): DataFrame =
    docs.select(registrableDomain(col(urlCol)).as("domain"),
        length(col(textCol)).as("nc"), col(langCol).as("lang"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        sum("nc").as("n_chars"),
        countDistinct("lang").as("n_langs"))

  /** Per-domain document cap: keep the `maxPerDomain` md5-smallest doc
    * ids per registrable domain (deterministic, order-free — the
    * RefinedWeb-style source balancing step). The rank filter is a
    * WindowGroupLimit: only ~cap rows per domain survive the exchange. */
  def domainQuota(docs: DataFrame, idCol: String, urlCol: String,
      maxPerDomain: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("domain")
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    docs.withColumn("domain", registrableDomain(col(urlCol)))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= maxPerDomain)
  }
}
