package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.model.Schemas
import graft.operators.{Augment, DatetimeDim, Projections, SetOps}
import graft.sources.{Sinks, Sources}

/** Weekly journey pipeline — rebuild of the reference's
  * journey-data-transformation.py: journey CSVs -> fact_journey,
  * dim_datetime, and augmentation of dim_station with station ids that
  * appear in journeys but not in the dim.
  *
  * Scale posture vs the reference: the fact is written partitioned by
  * (year, month) with dynamic partition overwrite instead of blind
  * append — re-processing a week is idempotent and date-range queries
  * prune partitions (SURVEY.md §7 hard parts: append-mode duplication).
  */
object JourneyPipeline {

  /** Read weekly journey CSVs (glob or dir), tolerate both TfL header
    * generations, parse timestamps, derive the weather join key
    * (journey-data-transformation.py:52-82). */
  def readJourneys(spark: SparkSession, path: String,
      genB: Boolean = false): DataFrame = {
    val schema = if (genB) Schemas.journeyGenB else Schemas.journeyGenA
    val raw =
      if (path.exists("*?[{".contains(_))) Sources.csv(spark, path, schema)
      else Sources.csvRecursive(spark, path, schema)
    normalizeJourneys(raw)
  }

  /** Header-drift normalization + timestamp parsing, independent of the
    * source generation. `try_to_timestamp`, not `to_timestamp`: under
    * Spark 4's ANSI default a malformed timestamp THROWS mid-job,
    * whereas the reference (Spark 3.5, non-ANSI) silently nulled it —
    * try_ restores the reference's tolerate-and-null contract. */
  def normalizeJourneys(raw: DataFrame): DataFrame =
    Projections.renameVariants(raw, Schemas.journeyRenames)
      .withColumn("start_date",
        try_to_timestamp(col("start_date_raw"), lit(Schemas.journeyTsPattern)))
      .withColumn("end_date",
        try_to_timestamp(col("end_date_raw"), lit(Schemas.journeyTsPattern)))
      .drop("start_date_raw", "end_date_raw")
      .withColumn("weather_date", to_date(col("start_date")))

  /** Station-dim augmentation (J1+U1+A2+A3): distinct (id, name) pairs
    * on either journey end that are absent from the current dim become
    * new dim rows with 0.0 placeholder coordinates
    * (journey-data-transformation.py:107-145). NOT IN semantics are
    * preserved via SQL (null on the dim side empties the result). */
  def augmentStations(spark: SparkSession, journeys: DataFrame,
      stationDim: DataFrame): DataFrame = {
    val newStart = Augment.newKeys(spark, journeys,
      Seq("CAST(`Start station number` AS BIGINT)" -> "station_id",
        "`Start station`" -> "station_name"),
      stationDim, "station_id")
    val newEnd = Augment.newKeys(spark, journeys,
      Seq("CAST(`End station number` AS BIGINT)" -> "station_id",
        "`End station`" -> "station_name"),
      stationDim, "station_id")
    val newStations = SetOps.unionDistinct(newStart, newEnd)
      .withColumn("longitude", lit(0.0).cast(DoubleType))
      .withColumn("latitude", lit(0.0).cast(DoubleType))
      .withColumn("easting", lit(0.0).cast(DoubleType))
      .withColumn("northing", lit(0.0).cast(DoubleType))
    SetOps.unionByNameDedup(stationDim, newStations, Seq("station_id"))
  }

  /** The fact frame: FK casts, datetime key, dropped text/duration
    * columns (journey-data-transformation.py:148-155). */
  def factJourney(journeys: DataFrame): DataFrame =
    Projections.dropIfExists(journeys, Schemas.journeyDrops)
      .withColumn("Start station number",
        col("Start station number").cast(LongType))
      .withColumn("End station number",
        col("End station number").cast(LongType))

  /** Run end-to-end against an output directory that may already hold a
    * station dim (read-or-empty) — writes dim_station (overwrite),
    * dim_datetime (merge-by-key by default, see below) and fact_journey
    * (partitioned idempotent overwrite).
    *
    * `idempotentDatetime = true` (default) merges the new datetime rows
    * into the existing dim by key — re-running a week is a fixpoint.
    * `false` reproduces the reference faithfully INCLUDING its flaw
    * (journey-data-transformation.py:196-210 appends blindly, so
    * re-processing a week re-appends its timestamps — SURVEY §7 hard
    * parts). */
  def run(spark: SparkSession, journeysPath: String, outDir: String,
      genB: Boolean = false, idempotentDatetime: Boolean = true): Unit = {
    val journeys = readJourneys(spark, journeysPath, genB).cache()
    val existing = Sources.parquetOrEmpty(
      spark, s"$outDir/dim_station", Schemas.station)
    // localCheckpoint materializes the augmented dim and cuts its
    // lineage BEFORE the overwrite deletes the very files the plan
    // reads (read-overwrite-same-path hazard) — distributed, no
    // driver-side collect.
    val augmented = augmentStations(spark, journeys, existing)
      .localCheckpoint(true)
    Sinks.overwriteParquet(augmented, s"$outDir/dim_station", numFiles = 4)

    val datetime = DatetimeDim.build(Seq(
      journeys -> col("start_date"), journeys -> col("end_date")))
    if (idempotentDatetime) {
      // Merge-by-key: every non-key column is a pure function of
      // datetime_id, so key dedup is fully deterministic. Same
      // read-overwrite hazard as the station dim -> checkpoint first.
      val prior = Sources.parquetOrEmpty(
        spark, s"$outDir/dim_datetime", datetime.schema)
      val merged = SetOps.unionByNameDedup(prior, datetime, Seq("datetime_id"))
        .localCheckpoint(true)
      Sinks.overwriteParquet(merged, s"$outDir/dim_datetime", numFiles = 8)
    } else {
      Sinks.appendParquet(datetime, s"$outDir/dim_datetime", numFiles = 8)
    }

    val fact = factJourney(journeys)
      .withColumn("year", year(col("start_date")))
      .withColumn("month", month(col("start_date")))
    Sinks.overwritePartitions(fact, s"$outDir/fact_journey", Seq("year", "month"))
    journeys.unpersist()
  }
}
