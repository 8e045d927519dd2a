package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for shuffled equi-joins (100 TB toolkit).
  *
  * First line of defense is AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on in our sessions) and
  * broadcasting small sides. Salting is the explicit fallback when one
  * side is too big to broadcast AND a handful of hot keys dominate (the
  * classic "null island" / default-value skew): the probe side gets a
  * deterministic salt in [0, buckets), the build side is replicated
  * once per salt value, and the join key becomes (key, salt) — hot keys
  * fan out over `buckets` reducers instead of melting one.
  */
object SkewJoin {

  /** Inner equi-join of `large` (skewed) with `small` (replicated
    * `buckets` times) on `keys`. Salt is derived from a hash of the
    * large side's whole row representation via `saltExpr` — caller
    * passes e.g. `hash(col("some_unique_col"))` or a `rand()`-based
    * salt when determinism doesn't matter. The reduction into
    * [0, buckets) is applied here with `pmod` — Spark's `%` preserves
    * sign, so a plain `hash()` salt (negative half the time) would
    * silently never match the replicated side's 0..buckets-1 values. */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      buckets: Int, saltExpr: Column): DataFrame = {
    val salted = large.withColumn("__salt", pmod(saltExpr, lit(buckets)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
