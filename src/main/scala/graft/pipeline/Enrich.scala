package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The `journeys_enriched` analytics table — rebuild of the reference's
  * BigQuery materialized join (README.md:224: fact joined with all
  * three dimensions "for a faster response" in BI).
  *
  * Join strategy at scale: the physically-bounded dims (stations ~1e3,
  * weather one row/day) broadcast, so those legs never shuffle the
  * fact; the datetime dim (one row per distinct timestamp — can reach
  * millions) is left to AQE to broadcast or shuffle based on its real
  * size. The station dim is joined twice under different aliases
  * (start/end leg).
  */
object Enrich {

  def journeysEnriched(
      fact: DataFrame,
      dimStation: DataFrame,
      dimDatetime: DataFrame,
      dimWeather: DataFrame): DataFrame = {
    val start = dimStation.select(
      col("station_id").as("start_station_id"),
      col("station_name").as("start_station_name"),
      col("latitude").as("start_latitude"),
      col("longitude").as("start_longitude"))
    val end = dimStation.select(
      col("station_id").as("end_station_id"),
      col("station_name").as("end_station_name"))
    // The partitioned fact carries year/month partition columns that
    // collide with the datetime dim's calendar attributes — the dim's
    // values win in the enriched table (same values, finer provenance).
    val cleanFact = Seq("year", "month").foldLeft(fact) { (f, c) =>
      if (f.columns.contains(c)) f.drop(c) else f
    }
    // Station and weather dims are bounded by the physical world
    // (docking stations, calendar days) — safe to pin broadcast. The
    // datetime dim grows with DISTINCT event timestamps (minute grain
    // over years reaches millions of rows), so its join strategy is
    // left to AQE's runtime size decision rather than pinned.
    cleanFact
      .join(broadcast(start),
        col("Start station number") === col("start_station_id"), "left")
      .join(broadcast(end),
        col("End station number") === col("end_station_id"), "left")
      .join(dimDatetime,
        col("start_date") === col("datetime_id"), "left")
      .join(broadcast(dimWeather), Seq("weather_date"), "left")
  }

  /** The README's flagship BI shape: rides per station per hour with
    * weather (SURVEY.md §7 minimum slice). */
  def ridesPerStationHour(enriched: DataFrame): DataFrame =
    enriched
      .groupBy(col("start_station_name"), col("year"), col("month"),
        col("day"), col("hour"))
      .agg(
        count(lit(1)).as("n_rides"),
        round(avg(col("temp")), 4).as("avg_temp"))
}
