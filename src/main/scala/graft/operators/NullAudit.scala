package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, LongType}

/** Per-column null/NaN audit (reference A1:
  * init-data-transformation.py:58-63,104-116). One global aggregate row;
  * `isnan` is only applied to floating-point columns — on other types a
  * strict engine would reject it.
  *
  * Scale: a single partial+final hash aggregate over all columns — one
  * pass, no shuffle of raw rows (only 32 partial rows exchange).
  */
object NullAudit {
  def audit(df: DataFrame, exclude: Seq[String] = Nil): DataFrame = {
    val fields = df.schema.fields.filterNot(f => exclude.contains(f.name))
    val aggs = fields.map { f =>
      val isBad = f.dataType match {
        case DoubleType | FloatType => col(f.name).isNull || isnan(col(f.name))
        case _                      => col(f.name).isNull
      }
      sum(when(isBad, 1).otherwise(0)).cast(LongType).alias(f.name)
    }
    df.agg(aggs.head, aggs.tail: _*)
  }
}
