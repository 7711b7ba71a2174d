package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** URL canonicalization and per-URL deduplication — the first dedup
  * stage of a web-crawl curation pipeline (CCNet/RefinedWeb keep one
  * document per normalized URL before any content-based dedup).
  *
  * Everything here is a composition of codegen'd string expressions —
  * no UDFs — so canonicalization runs map-side at full scan speed and
  * the dedup is ONE shuffle on the canonical key. Nothing is ever
  * collected; at 100 TB the canonical-URL groupBy partitions evenly
  * (URL hashes have no hot keys once tracking params are stripped).
  */
object Urls {

  /** Tracking query parameters stripped during canonicalization. */
  val TrackingParamRegex = "^(utm_[^=]*|fbclid|gclid|ref)="

  /** Canonical form of a schemeful URL:
    *
    *  1. fragment dropped;
    *  2. scheme dropped entirely (http/https variants collapse);
    *  3. host lowercased, leading `www.` and default ports 80/443
    *     stripped;
    *  4. tracking params (utm_*, fbclid, gclid, ref) removed, the
    *     surviving query params sorted for order-independence;
    *  5. trailing slash on the path stripped.
    *
    * Path case is preserved (paths are case-sensitive per RFC 3986;
    * only scheme+host are case-insensitive). Assumes a `scheme://`
    * URL — relative URLs pass through on the same rules minus host
    * handling quirks. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    // strip the scheme only when "://" is actually in SCHEME POSITION —
    // before the first '/' and '?'. Any other occurrence is an embedded
    // absolute URL inside the path/query ('?next=https://b.com'):
    // stripping there would canonicalize to the embedded host, collide
    // with an unrelated document, and break idempotence (the canonical
    // form is schemeless, so a second pass would re-split on the
    // embedded URL)
    val schemeEnd = instr(noFrag, "://")
    val slashPos = instr(noFrag, "/")
    val qPos = instr(noFrag, "?")
    val inSchemePos = schemeEnd > 0 &&
      (slashPos === 0 || schemeEnd < slashPos) &&
      (qPos === 0 || schemeEnd < qPos)
    val rest = when(inSchemePos,
      substring(noFrag, schemeEnd + 3, lit(Int.MaxValue))).otherwise(noFrag)
    // the authority ends at the EARLIEST of the first '/' and first '?':
    // an authority-only URL with a query ("ex.com?utm_x=1") has no '/',
    // and folding its query into the host would lowercase it, keep its
    // tracking params, and split it from its "/"-path twin
    val rSlash = instr(rest, "/")
    val rQ = instr(rest, "?")
    val hostEnd = when(rQ > 0 && (rSlash === 0 || rQ < rSlash), rQ - 1)
      .when(rSlash > 0, rSlash - 1)
      .otherwise(length(rest))
    val hostPort = lower(substring(rest, lit(1), hostEnd))
    val pathQ = substring(rest, hostEnd + 1, lit(Int.MaxValue))
    // "(www\.)+" not "www\.": a double-www host must canonicalize in one
    // pass or canonicalization loses idempotence
    val host = regexp_replace(regexp_replace(hostPort, "^(www\\.)+", ""),
      ":(80|443)$", "")
    val path = substring_index(pathQ, "?", 1)
    val query = when(instr(pathQ, "?") > 0, substring_index(pathQ, "?", -1))
      .otherwise(lit(""))
    val params = filter(split(query, "&"),
      p => !p.rlike(TrackingParamRegex) && p =!= "")
    val sortedQ = array_join(array_sort(params), "&")
    concat(host, regexp_replace(path, "/$", ""),
      when(length(sortedQ) > 0, concat(lit("?"), sortedQ)).otherwise(lit("")))
  }

  /** [[canonicalizeUrl]] evaluated in STAGES: each intermediate is a
    * real projected column, so the heavy substring/search subtrees are
    * computed once per row. The single-Column form necessarily inlines
    * `rest` into every consumer (~10 copies of the scheme-strip
    * substring per row — Catalyst's CollapseProject keeps multi-use
    * non-cheap aliases in separate projections, but a lone Column
    * expression has no aliases to keep); on the curation pipeline that
    * inlining tripled the URL-dedup stage's cost. Same result,
    * column-for-column. */
  def withCanonicalUrl(df: DataFrame, urlCol: String = "url",
      outCol: String = "canon_url"): DataFrame = {
    val noFrag = col("__nofrag")
    val rest = col("__rest")
    df.withColumn("__nofrag", substring_index(col(urlCol), "#", 1))
      .withColumn("__rest", {
        val schemeEnd = instr(noFrag, "://")
        val slashPos = instr(noFrag, "/")
        val qPos = instr(noFrag, "?")
        val inSchemePos = schemeEnd > 0 &&
          (slashPos === 0 || schemeEnd < slashPos) &&
          (qPos === 0 || schemeEnd < qPos)
        when(inSchemePos,
          substring(noFrag, schemeEnd + 3, lit(Int.MaxValue))).otherwise(noFrag)
      })
      .withColumn("__hostEnd", {
        val rSlash = instr(rest, "/")
        val rQ = instr(rest, "?")
        when(rQ > 0 && (rSlash === 0 || rQ < rSlash), rQ - 1)
          .when(rSlash > 0, rSlash - 1)
          .otherwise(length(rest))
      })
      .withColumn("__hostPort",
        lower(substring(rest, lit(1), col("__hostEnd"))))
      .withColumn("__pathQ",
        substring(rest, col("__hostEnd") + 1, lit(Int.MaxValue)))
      .withColumn("__host",
        regexp_replace(regexp_replace(col("__hostPort"), "^(www\\.)+", ""),
          ":(80|443)$", ""))
      .withColumn("__path", substring_index(col("__pathQ"), "?", 1))
      .withColumn("__query",
        when(instr(col("__pathQ"), "?") > 0,
          substring_index(col("__pathQ"), "?", -1)).otherwise(lit("")))
      .withColumn("__sq", array_join(array_sort(
        filter(split(col("__query"), "&"),
          p => !p.rlike(TrackingParamRegex) && p =!= "")), "&"))
      .withColumn(outCol, concat(col("__host"),
        regexp_replace(col("__path"), "/$", ""),
        when(length(col("__sq")) > 0, concat(lit("?"), col("__sq")))
          .otherwise(lit(""))))
      .drop("__nofrag", "__rest", "__hostEnd", "__hostPort", "__pathQ",
        "__host", "__path", "__query", "__sq")
  }

  /** Mark one keeper per canonical URL: the longest document
    * (`lengthCol` desc), ties to the smallest id — deterministic at
    * any parallelism. Adds `canon_url` and `kept` (1/0) columns; the
    * caller filters `kept = 1` to materialize the deduped corpus or
    * keeps the flag for audit. One window shuffle on the canonical
    * key. */
  def dedupByUrl(docs: DataFrame, urlCol: String = "url",
      idCol: String = "doc_id", lengthCol: String = "n_chars"): DataFrame = {
    val w = Window.partitionBy("canon_url")
      .orderBy(col(lengthCol).desc, col(idCol).asc)
    withCanonicalUrl(docs, urlCol, "canon_url")
      .withColumn("kept",
        when(row_number().over(w) === 1, lit(1)).otherwise(lit(0)))
  }
}
