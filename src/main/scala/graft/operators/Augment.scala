package graft.operators

import java.util.UUID
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dimension augmentation via null-aware anti join (reference J1:
  * journey-data-transformation.py:110-127 — `NOT IN (SELECT ...)` guarded
  * by `IS NOT NULL`).
  *
  * Kept as SQL text on purpose: Catalyst rewrites `NOT IN` into a
  * null-aware anti join, preserving the subtle semantics that a NULL on
  * the subquery side empties the result — a plain `left_anti` join does
  * NOT (SURVEY.md §7 hard parts).
  *
  * Scale: when the dim side is small Catalyst broadcasts it
  * (BroadcastNestedLoopJoin / BroadcastHashJoin for null-aware anti);
  * large dims fall back to a shuffled anti join on the key.
  */
object Augment {

  /** Distinct probe-side keys (plus companion columns) absent from the dim.
    *
    * @param probeExprs (expression, alias) pairs projected from the probe;
    *                   the first one is the key tested against the dim.
    */
  def newKeys(
      spark: SparkSession,
      probe: DataFrame,
      probeExprs: Seq[(String, String)],
      dim: DataFrame,
      dimKeyExpr: String): DataFrame = {
    val id = UUID.randomUUID().toString.replace("-", "")
    val probeView = s"graft_probe_$id"
    val dimView = s"graft_dim_$id"
    probe.createOrReplaceTempView(probeView)
    dim.createOrReplaceTempView(dimView)
    val keyExpr = probeExprs.head._1
    val proj = probeExprs.map { case (e, a) => s"$e AS `$a`" }.mkString(", ")
    val out = spark.sql(
      s"""SELECT DISTINCT $proj
         |FROM $probeView
         |WHERE $keyExpr IS NOT NULL
         |  AND $keyExpr NOT IN (SELECT $dimKeyExpr FROM $dimView)""".stripMargin)
    spark.catalog.dropTempView(probeView)
    spark.catalog.dropTempView(dimView)
    out
  }
}
