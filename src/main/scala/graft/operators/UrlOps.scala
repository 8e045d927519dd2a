package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** URL canonicalization — the first dedup stage of a web-scale corpus
  * pipeline (CCNet / RefinedWeb dedup by URL before any content pass).
  * Pure map-tier column work: no shuffle, no UDF, every rule a codegen
  * string function, so the pass runs at scan speed on 100 TB of crawl
  * metadata.
  *
  * Rules (the standard canonicalization set, kept backreference-free so
  * the DuckDB oracle can mirror them verbatim):
  *  1. fragment dropped;
  *  2. scheme lowercased;
  *  3. authority lowercased, leading `www.` dropped, DEFAULT port
  *     dropped (`:443` for https, `:80` for http — nonstandard ports
  *     kept);
  *  4. trailing path slash dropped (a bare `/` survives; an empty path
  *     canonicalizes to `/`);
  *  5. tracking query params dropped (`utm_*`, `ref`, `fbclid`,
  *     `gclid`, `msclkid`), the rest SORTED and re-joined — param
  *     order never distinguishes two URLs;
  *  6. `domain` = last two host labels (registered-domain heuristic;
  *     a full public-suffix list is a data file, not an algorithm
  *     change — swap the regex for a suffix join to use one).
  */
object UrlOps {

  private val TrackingParam = "^(utm_[^=]*|ref|fbclid|gclid|msclkid)="

  /** Canonicalize `urlCol` of `df`: one row per input row with the
    * normalized URL, the cleaned host, and the registered-domain
    * heuristic — the key columns URL-dedup and per-domain caps group
    * on. */
  def normalize(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val u = col(urlCol)
    val noFrag = regexp_replace(u, "#.*", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = regexp_replace(
      lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)),
      "^www\\.", "")
    val host = when(scheme === "https", regexp_replace(auth, ":443$", ""))
      .when(scheme === "http", regexp_replace(auth, ":80$", ""))
      .otherwise(auth)
    val path0 = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(path0 === "", lit("/"))
      .when(length(path0) > 1 && path0.endsWith("/"),
        path0.substr(lit(1), length(path0) - 1))
      .otherwise(path0)
    val q0 = regexp_extract(noFrag, "[?]([^#]*)", 1)
    val kept = array_sort(filter(split(q0, "&"),
      x => x =!= "" && !x.rlike(TrackingParam)))
    val qn = array_join(kept, "&")
    val hostOnly = regexp_replace(host, ":[0-9]+$", "")
    val dom0 = regexp_extract(hostOnly, "([^.]+\\.[^.]+)$", 1)
    df.select(
      col(idCol).as("doc_id"),
      host.as("host"),
      when(dom0 === "", hostOnly).otherwise(dom0).as("domain"),
      concat(scheme, lit("://"), host, path,
        when(qn === "", lit("")).otherwise(concat(lit("?"), qn))).as("norm_url"))
  }
}
