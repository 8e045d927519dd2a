package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.JourneyStream

/** Structured Streaming specs: file-source ingest parity with the batch
  * pipeline, and the watermarked windowed aggregation.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val week1 =
    """Rental Id,Bike Id,Start Date,End Date,Start station number,Start station,End station number,End station,Total duration (ms)
      |101,11,05/01/2021 08:30,05/01/2021 08:45,1,Alpha,2,Beta,900000
      |102,12,05/01/2021 09:10,05/01/2021 09:30,2,Beta,1,Alpha,1200000
      |""".stripMargin

  private val week2 =
    """Rental Id,Bike Id,Start Date,End Date,Start station number,Start station,End station number,End station,Total duration (ms)
      |103,13,06/01/2021 08:05,06/01/2021 08:25,1,Alpha,2,Beta,1200000
      |""".stripMargin

  test("streaming ingest lands the same fact rows as the batch transform") {
    val dir = TestSpark.tmpDir("stream")
    Files.createDirectories(Paths.get(s"$dir/raw"))
    Files.writeString(Paths.get(s"$dir/raw/week1.csv"), week1)
    Files.writeString(Paths.get(s"$dir/raw/week2.csv"), week2)

    val stream = JourneyStream.readJourneyStream(spark, s"$dir/raw")
    val q = JourneyStream.journeyIngest(stream, s"$dir/fact", s"$dir/ckpt").start()
    q.awaitTermination(60000)

    val fact = spark.read.parquet(s"$dir/fact")
    assert(fact.count() == 3)
    assert(fact.select("rental_id").as[Long].collect().toSet == Set(101L, 102L, 103L))
    assert(fact.columns.contains("year") && fact.columns.contains("month"))

    // Restart on the same checkpoint: AvailableNow with no new files
    // must be a no-op (exactly-once replay safety).
    val q2 = JourneyStream.journeyIngest(
      JourneyStream.readJourneyStream(spark, s"$dir/raw"),
      s"$dir/fact", s"$dir/ckpt").start()
    q2.awaitTermination(60000)
    assert(spark.read.parquet(s"$dir/fact").count() == 3)
  }

  test("hourly windowed counts aggregate by event-time window") {
    val dir = TestSpark.tmpDir("streamagg")
    Files.createDirectories(Paths.get(s"$dir/raw"))
    Files.writeString(Paths.get(s"$dir/raw/week1.csv"), week1)

    val counts = JourneyStream.hourlyCounts(
      JourneyStream.readJourneyStream(spark, s"$dir/raw"))
    val q = counts.writeStream
      .format("memory").queryName("hourly_test")
      .outputMode("complete")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    // station stays a string column (declared CSV schema keeps FK text
    // until the fact's BIGINT cast).
    val out = spark.sql(
      "SELECT station, n_rides FROM hourly_test ORDER BY station")
      .as[(String, Long)].collect()
    assert(out.toSeq == Seq(("1", 1L), ("2", 1L)),
      "one 08:xx ride from station 1, one 09:xx ride from station 2")
  }
}
