package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Writers matching the reference's sink contracts (SURVEY.md §2.1
  * S6/S7/S12) plus the scale-safe incremental variant.
  */
object Sinks {

  /** S6: idempotent dimension write — fixed output file count via
    * repartition (round-robin exchange), full overwrite. */
  def overwriteParquet(df: DataFrame, path: String, numFiles: Int): Unit =
    df.repartition(numFiles).write.mode(SaveMode.Overwrite).parquet(path)

  /** S7: append write (the reference's weekly fact/datetime loads).
    * Faithful to the reference INCLUDING its flaw: re-processing a week
    * re-appends it, and per-run dedup can't see prior runs
    * (SURVEY.md §7 hard parts). Prefer [[overwritePartitions]]. */
  def appendParquet(df: DataFrame, path: String, numFiles: Int): Unit =
    df.repartition(numFiles).write.mode(SaveMode.Append).parquet(path)

  /** Idempotent incremental load: fact partitioned by (year, month) with
    * dynamic partition overwrite — re-running a week replaces exactly
    * the partitions it touches, never duplicating and never truncating
    * the rest of the table. This is the 100 TB posture (partition
    * pruning on date-ranged queries comes free). */
  def overwritePartitions(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** S12: publish to the warehouse layer — here the Spark catalog
    * (temp view), the BigQuery-load analogue. */
  def publishView(df: DataFrame, name: String): Unit =
    df.createOrReplaceTempView(name)
}
