package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest handling — rebuild of the reference's S3-listing scraper and
  * manifest consumer (web_scraper.py:16-57,
  * proc_0_ingest_to_GCP.dag.py:31-54) as relational operators: the
  * Python string surgery and max-by-date loops become Catalyst
  * expressions (SURVEY.md §2 S9/S10, P7, F7, F8, A4).
  */
object ManifestOps {

  /** Filter raw listing keys the way the scraper does (P7+F7):
    * `usage-stats/` prefix, `.csv`/`.xlsx` suffix, and a trailing
    * 4-digit year inside the allowed window. The year comes from the
    * file stem's trailing digits, e.g.
    * `usage-stats/17Mar2021-23Mar2021.csv`. */
  def filterListing(listing: DataFrame, keyCol: String,
      years: Seq[Int]): DataFrame = {
    val stem = regexp_extract(col(keyCol), "([^/]+)\\.(csv|xlsx)$", 1)
    val yr = regexp_extract(stem, "(\\d{4})$", 1)
    listing.where(
      col(keyCol).startsWith("usage-stats/") &&
        (col(keyCol).endsWith(".csv") || col(keyCol).endsWith(".xlsx")) &&
        yr =!= "" && yr.cast("int").isin(years: _*))
  }

  /** Listing keys -> manifest entries keyed by period end date
    * (`ddMMMyyyy` stem suffix -> `end_date`), value = the key itself
    * (web_scraper.py:46-57's links dictionary as a DataFrame). */
  def toManifest(listing: DataFrame, keyCol: String): DataFrame = {
    val stem = regexp_extract(col(keyCol), "([^/]+)\\.[a-z]+$", 1)
    listing.select(
      element_at(split(stem, "-"), -1).as("end_date"),
      col(keyCol).as("relative_url"))
  }

  /** A4/F8: the entry for `execDate` if present, else the latest entry
    * by parsed `ddMMMyyyy` date (proc_0_ingest_to_GCP.dag.py:31-43's
    * fallback). `max_by` keeps it one aggregation, no sort. */
  def resolveEntry(spark: SparkSession, manifest: DataFrame,
      execDate: String): DataFrame = {
    val exact = manifest.where(col("end_date") === execDate)
    val latest = manifest.agg(
      max_by(col("end_date"), to_date(col("end_date"), "ddMMMyyyy")).as("end_date"),
      max_by(col("relative_url"), to_date(col("end_date"), "ddMMMyyyy")).as("relative_url"))
    if (exact.isEmpty) latest else exact
  }

  /** Monthly landing partition for a parsed period end date
    * (proc_0_ingest_to_GCP.dag.py:19's `MonYYYY` folder). */
  def landingPartition(endDate: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    date_format(to_date(endDate, "ddMMMyyyy"), "MMMyyyy")
}
