package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ManifestOps

/** Specs for the manifest/listing operators (S9/S10, P7, F7, F8, A4). */
class ManifestOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val listing = Seq(
    "usage-stats/17Mar2021-23Mar2021.csv",
    "usage-stats/24Mar2021-30Mar2021.csv",
    "usage-stats/01Jan2019-07Jan2019.csv", // out-of-window year
    "usage-stats/legacy-2022.xlsx",
    "other-prefix/17Mar2021-23Mar2021.csv", // wrong prefix
    "usage-stats/readme.txt" // wrong suffix
  ).toDF("key")

  test("P7/F7 listing filter: prefix, suffix, and year window") {
    val kept = ManifestOps.filterListing(listing, "key", 2021 to 2025)
      .as[String].collect().toSet
    assert(kept == Set(
      "usage-stats/17Mar2021-23Mar2021.csv",
      "usage-stats/24Mar2021-30Mar2021.csv",
      "usage-stats/legacy-2022.xlsx"))
  }

  test("manifest entries key by ddMMMyyyy period end date") {
    val m = ManifestOps.toManifest(
      ManifestOps.filterListing(listing, "key", 2021 to 2021), "key")
      .orderBy("end_date").as[(String, String)].collect()
    assert(m.toSeq == Seq(
      ("23Mar2021", "usage-stats/17Mar2021-23Mar2021.csv"),
      ("30Mar2021", "usage-stats/24Mar2021-30Mar2021.csv")))
  }

  test("A4/F8 resolveEntry: exact hit, else latest by parsed date") {
    val m = ManifestOps.toManifest(
      ManifestOps.filterListing(listing, "key", 2021 to 2021), "key")
    val exact = ManifestOps.resolveEntry(spark, m, "23Mar2021")
      .as[(String, String)].head()
    assert(exact._1 == "23Mar2021")
    val fallback = ManifestOps.resolveEntry(spark, m, "31Dec2030")
      .as[(String, String)].head()
    assert(fallback._1 == "30Mar2021", "latest by date, not lexicographic")
  }

  test("landing partition formats MonYYYY") {
    val p = Seq("23Mar2021").toDF("d")
      .select(ManifestOps.landingPartition(col("d"))).as[String].head()
    assert(p == "Mar2021")
  }
}
