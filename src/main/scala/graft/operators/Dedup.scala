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

  /** First row per key under `order` survives — deterministic.
    *
    * The window's partition keys carry the `__ent` provenance marker
    * while it runs (renamed back before return): per-key rows are that
    * key's DUPLICATE count, bounded by the entity — the declaration
    * the PlanSpec catalog sweep sanctions instead of trusting key
    * names (VERDICT r09 item 2). A caller whose key can accumulate a
    * corpus-scale duplicate group should rank via
    * [[Ranking.groupedRank]] rather than claim entity bounds here.
    * The marker rides ALIAS columns (not renames) so `order` may still
    * reference the keys. */
  def deterministic(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val tagged = keys.map(k => k -> s"__ent_$k")
    val w = Window.partitionBy(tagged.map(p => col(p._2)): _*).orderBy(order: _*)
    tagged.foldLeft(df) { case (d, (k, t)) => d.withColumn(t, col(k)) }
      .withColumn("__graft_rn", row_number().over(w))
      .where(col("__graft_rn") === 1)
      .drop("__graft_rn" +: tagged.map(_._2): _*)
  }
}
