package graft.sources

import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** Readers for the reference's source formats (SURVEY.md §2.1 S1-S5).
  *
  * Declared schemas everywhere — `inferSchema=true` costs an extra full
  * scan of every file before the real job (SURVEY.md §3) and lets types
  * drift across weekly files; at 100 TB both are unacceptable.
  */
object Sources {

  /** S1/S2: header CSV with a declared schema; `path` may be a file,
    * directory, or glob (Spark globbing is built in). */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", true).schema(schema).csv(path)

  /** S1 with inference — kept for schema-discovery tooling only. */
  def csvInfer(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", true).option("inferSchema", true).csv(path)

  /** S3: recursive directory scan (non-glob prefix fallback,
    * journey-data-transformation.py:55-57). */
  def csvRecursive(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.option("header", true).option("recursiveFileLookup", true)
      .schema(schema).csv(dir)

  /** S1 variant with quarantine: PERMISSIVE mode keeps rows that fail
    * the declared schema, parking the raw line in `_corrupt_record`
    * instead of failing the job or silently dropping data — the
    * robustness-by-construction posture the reference gets from
    * try/except, expressed relationally. Callers split on
    * `_corrupt_record IS NULL` to route clean rows vs a quarantine
    * sink. */
  def csvPermissive(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", true)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .csv(path)

  /** S4 + F9: weather JSON whose root may be `{"days":[...]}`,
    * `{"data":[...]}`, or a bare `[...]` array
    * (init_0_ingestion_to_GCS_dag.py:66-94 does this in Python; here it
    * happens inside Spark: wholetext read -> from_json each candidate
    * shape -> coalesce -> explode). One file = one row pre-explode, so
    * this is for modest config-ish inputs, not the 100 TB fact path. */
  def jsonDays(spark: SparkSession, path: String, day: StructType): DataFrame = {
    val raw = spark.read.option("wholetext", true).text(path)
    val arr = ArrayType(day)
    val wrapped = new StructType()
      .add("days", arr).add("data", arr)
    raw
      .select(
        coalesce(
          from_json(col("value"), wrapped).getField("days"),
          from_json(col("value"), wrapped).getField("data"),
          from_json(col("value"), arr)).as("days"))
      .where(col("days").isNotNull)
      .select(explode(col("days")).as("day"))
      .select(col("day.*"))
  }

  /** S5: parquet read with empty-typed-frame fallback when the folder
    * doesn't exist yet (first pipeline run,
    * journey-data-transformation.py:98-105). Existence is checked via
    * the Hadoop FS (works for any supported scheme), not try/except
    * around the lazy read — Spark defers path errors to action time. */
  def parquetOrEmpty(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (Try(fs.exists(p)).getOrElse(false))
      spark.read.schema(schema).parquet(path)
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }
}
