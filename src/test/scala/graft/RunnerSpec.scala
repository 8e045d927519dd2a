package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Enrich, Runner, RunnerConfig}

/** E2E spec for the one-call pipeline entry point: init -> journey ->
  * materialized enrichment -> publish, plus idempotency fixpoints
  * (dim_datetime merge, enriched-refresh stability).
  */
class RunnerSpec extends AnyFunSuite {
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
      |2,Beta Dock,-0.2,51.6,531000.0,181000.0
      |""".stripMargin

  private val journeysCsv =
    """Rental Id,Bike Id,Start Date,End Date,Start station number,Start station,End station number,End station,Total duration (ms)
      |101,11,05/01/2021 08:30,05/01/2021 08:45,1,Alpha Dock,2,Beta Dock,900000
      |102,12,05/01/2021 09:00,05/01/2021 09:20,99,Gamma Dock,1,Alpha Dock,1200000
      |""".stripMargin

  private val weatherJson =
    """[{"datetime":"2021-01-05","temp":4.5,"tempmax":6.0,"tempmin":2.0,
      |"feelslike":3.0,"humidity":80.0,"precip":0.1,"windgust":30.0,
      |"windspeed":12.0,"winddir":270.0,"sealevelpressure":1012.0,
      |"visibility":9.0,"solarradiation":40.0,"uvindex":1.0,
      |"moonphase":0.5,"sunrise":"08:05","sunset":"16:10",
      |"cloudcover":90.0,"conditions":"Rain","description":"rainy",
      |"icon":"rain","preciptype":["rain"],"source":"obs",
      |"stations":["s1"],"datetimeEpoch":1609804800,"dew":2.0,
      |"precipcover":4.0,"sunriseEpoch":1609833900,"sunsetEpoch":1609862000,
      |"snow":0.0,"snowdepth":0.0}]""".stripMargin.replace("\n", "")

  private def config(dir: String): RunnerConfig = RunnerConfig(
    stationsCsv = write(dir, "stations.csv", stationsCsv),
    weatherJson = write(dir, "weather.json", weatherJson),
    journeysPath = { write(dir, "raw/week1.csv", journeysCsv); s"$dir/raw" },
    outDir = s"$dir/out")

  test("one call runs init -> journey -> materialized enrich -> publish") {
    val dir = TestSpark.tmpDir("runner")
    val cfg = config(dir)
    val (stationAudit, weatherAudit) = Runner.run(spark, cfg)
    assert(stationAudit.count() == 1 && weatherAudit.count() == 1)

    // Every table materialized on disk and published as a view.
    Runner.TableNames.foreach { t =>
      assert(Files.exists(Paths.get(s"${cfg.outDir}/$t")), s"missing table $t")
      assert(spark.catalog.tableExists(t), s"unpublished view $t")
    }

    // The enriched table is a real partitioned materialization: BI reads
    // it directly — no joins in the consuming plan.
    val enriched = Runner.enrichedTable(spark, cfg.outDir)
    assert(Files.list(Paths.get(s"${cfg.outDir}/journeys_enriched"))
      .anyMatch(p => p.getFileName.toString.startsWith("year=")),
      "enriched table must be partitioned by year")
    val r101 = enriched.where($"rental_id" === 101L).head()
    assert(r101.getAs[String]("start_station_name") == "Alpha Dock")
    assert(r101.getAs[Double]("temp") == 4.5)

    val byHour = Enrich.ridesPerStationHour(enriched)
    assert(byHour.where($"start_station_name" === "Alpha Dock" && $"hour" === 8)
      .select("n_rides").as[Long].head() == 1L)
    val plan = byHour.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"rides-per-station-hour off the materialized table must not re-join:\n$plan")
  }

  test("re-running the pipeline is a fixpoint: datetime dim and enriched stable") {
    val dir = TestSpark.tmpDir("runner_fix")
    val cfg = config(dir)
    Runner.run(spark, cfg)
    val datetimeCount = spark.read.parquet(s"${cfg.outDir}/dim_datetime").count()
    val enrichedCount = Runner.enrichedTable(spark, cfg.outDir).count()
    assert(datetimeCount == 4, "2 journeys x (start, end) distinct timestamps")

    Runner.run(spark, cfg) // same week again
    assert(spark.read.parquet(s"${cfg.outDir}/dim_datetime").count() == datetimeCount,
      "idempotent datetime merge must not grow the dim on re-run")
    assert(Runner.enrichedTable(spark, cfg.outDir).count() == enrichedCount,
      "enriched refresh must replace, not duplicate, its partitions")
  }

  test("reference-faithful append mode reproduces the duplication flaw") {
    val dir = TestSpark.tmpDir("runner_legacy")
    val cfg = config(dir).copy(idempotentDatetime = false, registerViews = false)
    Runner.run(spark, cfg)
    val n1 = spark.read.parquet(s"${cfg.outDir}/dim_datetime").count()
    Runner.run(spark, cfg)
    val n2 = spark.read.parquet(s"${cfg.outDir}/dim_datetime").count()
    assert(n2 == 2 * n1, "append mode re-appends the week (the reference's flaw)")
  }
}
