package graft.model

import org.apache.spark.sql.types._

/** Declared schemas for the reference's tables — replaces the
  * reference's `inferSchema=true` / `autodetect` (SURVEY.md §4: one
  * fewer full read of every CSV and stable types across weekly files).
  *
  * Column sets follow FIXTURES.md; the station dim schema mirrors the
  * reference's explicit StructType
  * (journey-data-transformation.py:88-95), the journey schemas cover
  * both TfL header generations
  * (journey-data-transformation.py:63-71).
  */
object Schemas {

  /** dim_station target schema — reference declares exactly this. */
  val station: StructType = StructType(Seq(
    StructField("station_id", LongType),
    StructField("station_name", StringType),
    StructField("longitude", DoubleType),
    StructField("latitude", DoubleType),
    StructField("easting", DoubleType),
    StructField("northing", DoubleType)))

  /** Raw stations CSV header (init-data-transformation.py:49-54). */
  val stationsCsv: StructType = StructType(Seq(
    StructField("Station.Id", LongType),
    StructField("StationName", StringType),
    StructField("longitude", DoubleType),
    StructField("latitude", DoubleType),
    StructField("easting", DoubleType),
    StructField("northing", DoubleType)))

  /** Journey CSV, 2021-era headers ("Start Date", duration in ms). */
  val journeyGenA: StructType = StructType(Seq(
    StructField("Rental Id", LongType),
    StructField("Bike Id", LongType),
    StructField("Start Date", StringType),
    StructField("End Date", StringType),
    StructField("Start station number", StringType),
    StructField("Start station", StringType),
    StructField("End station number", StringType),
    StructField("End station", StringType),
    StructField("Total duration (ms)", LongType)))

  /** Journey CSV, 2022+ headers ("Start date", human duration, model). */
  val journeyGenB: StructType = StructType(Seq(
    StructField("Rental Id", LongType),
    StructField("Bike Id", LongType),
    StructField("Bike model", StringType),
    StructField("Start date", StringType),
    StructField("End date", StringType),
    StructField("Start station number", StringType),
    StructField("Start station", StringType),
    StructField("End station number", StringType),
    StructField("End station", StringType),
    StructField("Total duration", StringType)))

  /** Normalized journey header variants -> canonical names
    * (journey-data-transformation.py:63-71). */
  val journeyRenames: Map[String, String] = Map(
    "Rental Id" -> "rental_id",
    "Bike Id" -> "bike_id",
    "Bike model" -> "bike_model",
    "Start Date" -> "start_date_raw",
    "Start date" -> "start_date_raw",
    "End Date" -> "end_date_raw",
    "End date" -> "end_date_raw")

  /** Journey columns dropped from the fact
    * (journey-data-transformation.py:150-151). */
  val journeyDrops: Seq[String] = Seq(
    "Start station", "End station", "Total duration (ms)", "Total duration")

  /** One weather day object (Visual-Crossing-ish daily shape,
    * FIXTURES.md §3) — key + kept measures + droppable noise. */
  val weatherDay: StructType = StructType(
    StructField("datetime", StringType) +:
      (Seq("tempmax", "tempmin", "temp", "feelslike", "humidity", "precip",
        "windgust", "windspeed", "winddir", "sealevelpressure",
        "visibility", "solarradiation", "uvindex", "moonphase")
        .map(StructField(_, DoubleType)) ++
        Seq(StructField("sunrise", StringType), StructField("sunset", StringType)) ++
        // droppable noise columns (init-data-transformation.py:82-87)
        Seq(StructField("cloudcover", DoubleType),
          StructField("conditions", StringType),
          StructField("description", StringType),
          StructField("icon", StringType),
          StructField("preciptype", ArrayType(StringType)),
          StructField("source", StringType),
          StructField("stations", ArrayType(StringType)),
          StructField("datetimeEpoch", LongType),
          StructField("dew", DoubleType),
          StructField("precipcover", DoubleType),
          StructField("sunriseEpoch", LongType),
          StructField("sunsetEpoch", LongType),
          StructField("precipprob", DoubleType),
          StructField("snow", DoubleType),
          StructField("snowdepth", DoubleType),
          StructField("severerisk", DoubleType))))

  /** Weather columns dropped (init-data-transformation.py:82-100). */
  val weatherDrops: Seq[String] = Seq(
    "cloudcover", "conditions", "datetimeEpoch", "description", "dew",
    "icon", "precipcover", "preciptype", "source", "stations",
    "sunriseEpoch", "sunsetEpoch",
    "precipprob", "snow", "snowdepth", "severerisk")

  /** TfL journey timestamp pattern (journey-data-transformation.py:76). */
  val journeyTsPattern = "dd/MM/yyyy HH:mm"
}
