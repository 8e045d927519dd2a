package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

import graft.model.Schemas
import graft.operators.{NullAudit, Projections}
import graft.sources.{Sinks, Sources}

/** Seed-dimension pipeline — rebuild of the reference's
  * init-data-transformation.py: stations CSV -> dim_station parquet,
  * weather JSON -> dim_weather parquet, each with a null/NaN audit.
  */
object InitPipeline {

  /** stations CSV -> renamed, typed dim_station frame
    * (init-data-transformation.py:41-63). */
  def stationsDim(spark: SparkSession, stationsCsvPath: String): DataFrame =
    Projections.renameVariants(
      Sources.csv(spark, stationsCsvPath, Schemas.stationsCsv),
      Map("Station.Id" -> "station_id", "StationName" -> "station_name"))

  /** weather JSON (any root shape) -> dim_weather frame: drop the noise
    * columns, key by weather_date DATE
    * (init-data-transformation.py:77-116). */
  def weatherDim(spark: SparkSession, weatherJsonPath: String): DataFrame = {
    val days = Sources.jsonDays(spark, weatherJsonPath, Schemas.weatherDay)
    Projections.dropIfExists(days, Schemas.weatherDrops)
      .withColumnRenamed("datetime", "weather_date")
      .withColumn("weather_date", col("weather_date").cast(DateType))
  }

  /** Run end-to-end: build both dims, audit, write parquet with the
    * reference's file counts (stations 4, weather 10). Returns the two
    * audit frames (one row each) for observability. */
  def run(spark: SparkSession, stationsCsvPath: String, weatherJsonPath: String,
      outDir: String): (DataFrame, DataFrame) = {
    val stations = stationsDim(spark, stationsCsvPath)
    val weather = weatherDim(spark, weatherJsonPath)
    Sinks.overwriteParquet(stations, s"$outDir/dim_station", numFiles = 4)
    Sinks.overwriteParquet(weather, s"$outDir/dim_weather", numFiles = 10)
    (NullAudit.audit(stations),
      NullAudit.audit(weather, exclude = Seq("weather_date")))
  }
}
