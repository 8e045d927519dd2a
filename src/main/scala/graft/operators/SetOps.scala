package graft.operators

import org.apache.spark.sql.DataFrame

/** Set operations (reference U1/U2:
  * journey-data-transformation.py:120,138-141,177-180).
  *
  * SQL `UNION` deduplicates; Scala `Dataset.union` is UNION ALL — the
  * explicit `.distinct()` here preserves the SQL semantics.
  */
object SetOps {
  /** SQL UNION: union all + distinct. */
  def unionDistinct(a: DataFrame, b: DataFrame): DataFrame =
    a.union(b).distinct()

  /** unionByName with missing-column tolerance + key dedup (U2+A3). */
  def unionByNameDedup(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b, allowMissingColumns = true).dropDuplicates(keys)
}
