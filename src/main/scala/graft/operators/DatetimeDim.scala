package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Datetime dimension builder (reference:
  * journey-data-transformation.py:156-180 — distinct start/end timestamps
  * decorated with calendar attributes, unioned and deduped by key).
  *
  * Column set mirrors the reference exactly: datetime_id, year, week_day
  * (1 = Sunday, Spark/PySpark `dayofweek` convention), month, day, hour,
  * minute, second.
  *
  * Scale: distinct-by-key is a partial+final hash aggregate (map-side
  * combine shrinks the shuffle to the distinct-timestamp cardinality);
  * attribute extraction happens after dedup so only distinct keys pay it.
  */
object DatetimeDim {

  /** Distinct non-null timestamps from the given columns across frames. */
  def build(sources: Seq[(DataFrame, Column)]): DataFrame = {
    val ids = sources
      .map { case (df, c) => df.select(c.as("datetime_id")) }
      .reduce(_.unionByName(_))
      .where(col("datetime_id").isNotNull)
      .dropDuplicates("datetime_id") // key == whole row, so deterministic
    attributes(ids)
  }

  /** Decorate a one-column (`datetime_id`) frame with calendar attributes. */
  def attributes(ids: DataFrame): DataFrame =
    ids.select(
      col("datetime_id"),
      year(col("datetime_id")).as("year"),
      dayofweek(col("datetime_id")).as("week_day"),
      month(col("datetime_id")).as("month"),
      dayofmonth(col("datetime_id")).as("day"),
      hour(col("datetime_id")).as("hour"),
      minute(col("datetime_id")).as("minute"),
      second(col("datetime_id")).as("second"))
}
