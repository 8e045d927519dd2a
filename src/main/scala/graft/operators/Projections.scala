package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Drift-tolerant projection helpers.
  *
  * The reference handles weekly schema drift by renaming header variants
  * and dropping columns only when present
  * (reference: airflow/dags/scripts/journey-data-transformation.py:63-71,
  * init-data-transformation.py:82-100). These are pure plan rewrites —
  * Catalyst prunes the dropped columns out of the parquet scan.
  */
object Projections {

  /** Apply a `from -> to` rename map, skipping absent columns. */
  def renameVariants(df: DataFrame, variants: Map[String, String]): DataFrame =
    variants.foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }

  /** Drop columns that exist; silently skip the rest. */
  def dropIfExists(df: DataFrame, cols: Seq[String]): DataFrame =
    df.drop(cols.filter(df.columns.contains): _*)

  /** Cast named columns to target types, skipping absent columns. */
  def castCols(df: DataFrame, casts: Map[String, DataType]): DataFrame =
    casts.foldLeft(df) { case (d, (name, dt)) =>
      if (d.columns.contains(name)) d.withColumn(name, col(name).cast(dt)) else d
    }
}
