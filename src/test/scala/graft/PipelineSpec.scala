package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Schemas
import graft.pipeline.{Enrich, InitPipeline, JourneyPipeline}
import graft.sources.Sources

/** End-to-end pipeline specs over TfL-shaped miniature fixtures
  * (FIXTURES.md): both journey header generations, multi-shape weather
  * JSON, station augmentation, idempotent re-runs.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def write(dir: String, name: String, content: String): String = {
    val p = Paths.get(dir, name)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
    p.toString
  }

  private val stationsCsv =
    """Station.Id,StationName,longitude,latitude,easting,northing
      |1,Alpha Dock,-0.1,51.5,530000.0,180000.0
      |2,Beta Dock,-0.2,51.6,531000.0,
      |""".stripMargin

  // Gen A: "Start Date", duration (ms); one null station, one unknown
  // station id (99), one malformed timestamp.
  private val journeysGenA =
    """Rental Id,Bike Id,Start Date,End Date,Start station number,Start station,End station number,End station,Total duration (ms)
      |101,11,05/01/2021 08:30,05/01/2021 08:45,1,Alpha Dock,2,Beta Dock,900000
      |102,12,05/01/2021 09:00,05/01/2021 09:20,99,Gamma Dock,1,Alpha Dock,1200000
      |103,13,not-a-date,05/01/2021 10:00,2,Beta Dock,,,600000
      |""".stripMargin

  // Gen B: "Start date", human duration, Bike model column.
  private val journeysGenB =
    """Rental Id,Bike Id,Bike model,Start date,End date,Start station number,Start station,End station number,End station,Total duration
      |201,21,CLASSIC,12/06/2022 07:15,12/06/2022 07:35,2,Beta Dock,88,Delta Dock,20m
      |202,22,PBSC_EBIKE,12/06/2022 18:00,12/06/2022 18:30,1,Alpha Dock,2,Beta Dock,30m
      |""".stripMargin

  private val weatherDay =
    """{"datetime":"2021-01-05","temp":4.5,"tempmax":6.0,"tempmin":2.0,
      |"feelslike":3.0,"humidity":80.0,"precip":0.1,"windgust":30.0,
      |"windspeed":12.0,"winddir":270.0,"sealevelpressure":1012.0,
      |"visibility":9.0,"solarradiation":40.0,"uvindex":1.0,
      |"moonphase":0.5,"sunrise":"08:05","sunset":"16:10",
      |"cloudcover":90.0,"conditions":"Rain","description":"rainy",
      |"icon":"rain","preciptype":["rain"],"source":"obs",
      |"stations":["s1"],"datetimeEpoch":1609804800,"dew":2.0,
      |"precipcover":4.0,"sunriseEpoch":1609833900,"sunsetEpoch":1609862000,
      |"snow":0.0,"snowdepth":0.0}""".stripMargin.replace("\n", "")

  test("S4/F9 weather JSON normalizes all three root shapes identically") {
    val dir = TestSpark.tmpDir("weather")
    write(dir, "days.json", s"""{"days":[$weatherDay]}""")
    write(dir, "data.json", s"""{"data":[$weatherDay]}""")
    write(dir, "bare.json", s"""[$weatherDay]""")
    val dims = Seq("days.json", "data.json", "bare.json")
      .map(f => InitPipeline.weatherDim(spark, s"$dir/$f"))
    dims.foreach { d =>
      assert(d.count() == 1)
      assert(d.columns.contains("weather_date"))
      Schemas.weatherDrops.foreach(c => assert(!d.columns.contains(c)))
      assert(d.select("temp").as[Double].head() == 4.5)
      assert(d.select(col("weather_date").cast("string")).as[String].head() == "2021-01-05")
    }
  }

  test("init pipeline writes dims and reports nulls") {
    val dir = TestSpark.tmpDir("init")
    val s = write(dir, "stations.csv", stationsCsv)
    val w = write(dir, "weather.json", s"""{"days":[$weatherDay]}""")
    val (stationAudit, weatherAudit) = InitPipeline.run(spark, s, w, s"$dir/out")
    assert(spark.read.parquet(s"$dir/out/dim_station").count() == 2)
    assert(spark.read.parquet(s"$dir/out/dim_weather").count() == 1)
    assert(stationAudit.head().getAs[Long]("northing") == 1) // the blank cell
    assert(!weatherAudit.columns.contains("weather_date")) // key excluded
  }

  test("journey pipeline: drift-tolerant read, augmentation, idempotent re-run") {
    val dir = TestSpark.tmpDir("journey")
    val out = s"$dir/out"
    val s = write(dir, "stations.csv", stationsCsv)
    val w = write(dir, "weather.json", s"""[$weatherDay]""")
    InitPipeline.run(spark, s, w, out)
    write(dir, "raw/genA/week1.csv", journeysGenA)
    write(dir, "raw/genB/week2.csv", journeysGenB)

    JourneyPipeline.run(spark, s"$dir/raw/genA", out)
    JourneyPipeline.run(spark, s"$dir/raw/genB", out, genB = true)

    val stations = spark.read.parquet(s"$out/dim_station")
    // 1, 2 seeded; 99 (gen A) and 88 (gen B) augmented with 0.0 coords.
    assert(stations.select("station_id").as[Long].collect().toSet ==
      Set(1L, 2L, 88L, 99L))
    val augmented = stations.where($"station_id" === 99L).head()
    assert(augmented.getAs[String]("station_name") == "Gamma Dock")
    assert(augmented.getAs[Double]("longitude") == 0.0)

    val fact = spark.read.parquet(s"$out/fact_journey")
    // 5 rows total; malformed timestamp row has null start_date/year —
    // lands in the null partition, still present.
    assert(fact.count() == 5)
    assert(fact.columns.contains("bike_model") == false ||
      fact.where($"rental_id" === 201L).select("bike_model").as[String].head() == "CLASSIC")

    // Re-running the same week must not duplicate the fact (partition
    // overwrite) nor grow the station dim (augmentation fixpoint).
    JourneyPipeline.run(spark, s"$dir/raw/genA", out)
    assert(spark.read.parquet(s"$out/fact_journey").count() == 5)
    assert(spark.read.parquet(s"$out/dim_station").count() == 4)
  }

  test("enrichment joins fact with all dims; rides-per-station-hour aggregates") {
    val dir = TestSpark.tmpDir("enrich")
    val out = s"$dir/out"
    val s = write(dir, "stations.csv", stationsCsv)
    val w = write(dir, "weather.json", s"""[$weatherDay]""")
    InitPipeline.run(spark, s, w, out)
    write(dir, "raw/week1.csv", journeysGenA)
    JourneyPipeline.run(spark, s"$dir/raw", out)

    val enriched = Enrich.journeysEnriched(
      spark.read.parquet(s"$out/fact_journey"),
      spark.read.parquet(s"$out/dim_station"),
      spark.read.parquet(s"$out/dim_datetime"),
      spark.read.parquet(s"$out/dim_weather"))
    val r101 = enriched.where($"rental_id" === 101L).head()
    assert(r101.getAs[String]("start_station_name") == "Alpha Dock")
    assert(r101.getAs[String]("end_station_name") == "Beta Dock")
    assert(r101.getAs[Double]("temp") == 4.5)
    assert(r101.getAs[Int]("hour") == 8)

    val byHour = Enrich.ridesPerStationHour(enriched)
    assert(byHour.where($"start_station_name" === "Alpha Dock" && $"hour" === 8)
      .select("n_rides").as[Long].head() == 1L)
  }

  test("permissive CSV quarantines malformed rows instead of dropping them") {
    val dir = TestSpark.tmpDir("permissive")
    val p = write(dir, "mixed.csv",
      """id,v
        |1,2.5
        |not-a-long,3.5
        |2,4.5
        |""".stripMargin)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", org.apache.spark.sql.types.LongType)
      .add("v", org.apache.spark.sql.types.DoubleType)
    val df = Sources.csvPermissive(spark, p, schema).cache()
    val clean = df.where(col("_corrupt_record").isNull)
    val quarantined = df.where(col("_corrupt_record").isNotNull)
    assert(clean.count() == 2)
    assert(quarantined.select("_corrupt_record").as[String].collect().toSeq ==
      Seq("not-a-long,3.5"), "raw line preserved for replay/debugging")
    df.unpersist()
  }

  test("S5 parquetOrEmpty returns typed empty frame for missing path") {
    val df = Sources.parquetOrEmpty(spark, "/nonexistent/nowhere", Schemas.station)
    assert(df.schema == Schemas.station && df.count() == 0)
  }
}
