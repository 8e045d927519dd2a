package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-based deduplication (reference A3:
  * journey-data-transformation.py:141,180 — `dropDuplicates([key])`).
  *
  * `dropDuplicates` keeps an arbitrary row per key (partitioning-
  * dependent); `deterministic` fixes the survivor with a window
  * `row_number`, which is what golden/oracle tests need.
  *
  * Scale: both are a single hash-partition shuffle on the key. The
  * window variant sorts within partitions (no extra exchange beyond the
  * partitionBy); prefer `arbitrary` when the survivor doesn't matter —
  * it map-side combines.
  */
object Dedup {
  /** Arbitrary surviving row — Spark's native dropDuplicates. */
  def arbitrary(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** First row per key under `order` survives — deterministic. */
  def deterministic(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__graft_rn", row_number().over(w))
      .where(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }
}
