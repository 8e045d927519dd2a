package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

import graft.model.Schemas
import graft.pipeline.JourneyPipeline
import graft.sources.Sinks

/** Structured Streaming extension (SURVEY.md §2.9: the reference's
  * weekly-file batch cadence is the batch analogue of a file stream;
  * this module is the streaming-native version of the same semantics).
  *
  * Two entry points:
  *  - [[journeyIngest]]: file-source stream over the raw landing dir;
  *    each micro-batch runs the SAME normalization the batch pipeline
  *    uses and upserts into the partitioned fact — one transform
  *    definition, two execution modes.
  *  - [[hourlyCounts]]: event-time tumbling-window aggregation with a
  *    watermark (late rides beyond 2 hours are dropped, state is
  *    bounded — the 100 TB streaming requirement).
  */
object JourneyStream {

  /** Streaming read of weekly journey CSVs as they land. */
  def readJourneyStream(spark: SparkSession, rawDir: String,
      genB: Boolean = false): DataFrame = {
    val schema = if (genB) Schemas.journeyGenB else Schemas.journeyGenA
    val raw = spark.readStream
      .option("header", true)
      .option("maxFilesPerTrigger", 4) // bound per-batch work
      .schema(schema)
      .csv(rawDir)
    JourneyPipeline.normalizeJourneys(raw)
  }

  /** Incremental fact ingest via foreachBatch: every micro-batch is the
    * batch pipeline's fact transform + idempotent partition overwrite,
    * so replays (checkpoint recovery re-delivers a batch) cannot
    * duplicate rows. */
  def journeyIngest(journeys: DataFrame, factDir: String,
      checkpointDir: String): DataStreamWriter[org.apache.spark.sql.Row] =
    journeys.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val fact = JourneyPipeline.factJourney(batch)
          .withColumn("year", year(col("start_date")))
          .withColumn("month", month(col("start_date")))
        Sinks.overwritePartitions(fact, factDir, Seq("year", "month"))
      }

  /** Watermarked tumbling-window counts per start station. */
  def hourlyCounts(journeys: DataFrame): DataFrame =
    journeys
      .withWatermark("start_date", "2 hours")
      .groupBy(
        window(col("start_date"), "1 hour").as("w"),
        col("Start station number").as("station"))
      .agg(count(lit(1)).as("n_rides"))
      .select(col("w.start").as("hour_start"), col("station"), col("n_rides"))
}
