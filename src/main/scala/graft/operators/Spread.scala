package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism spread for heavy map tiers over SMALL
  * scans (guide §2.5 input skew / §6 input split size).
  *
  * Bench-scale parquet inputs are single small files — ONE scan
  * partition — while the operators fed by them (shingle explode +
  * per-shingle md5, token feature extraction, per-vector distance
  * kernels) do corpus-scale work BEFORE the first exchange, serially
  * on one core of local[32]. A round-robin repartition to the
  * session's default parallelism right above the scan parallelizes
  * that map tier.
  *
  * Scale-adaptive, not a local constant: the spread fires only when
  * the input's estimated bytes are below what the scan would need to
  * fill `defaultParallelism` splits anyway — a production table whose
  * scan already yields >= cores partitions skips the extra exchange
  * entirely (the condition derives from input size and session conf,
  * nothing is tuned to local[32]).
  *
  * Exactness: a repartition changes row order, so this is applied
  * ONLY where every downstream aggregate is order-independent
  * (counts, longs, decimals, min/max, md5 draws, per-row maps — the
  * dedup/classifier/kmeans discipline this engine maintains for
  * DuckDB-oracle parity; the 150-query gate pins it).
  */
object Spread {
  /** `df` repartitioned round-robin to the session's default
    * parallelism when its estimated size says the scan cannot fill
    * the cores on its own; `df` unchanged otherwise. */
  def toCores(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    // Static size estimate only — probing the physical partition count
    // would force an adaptive plan to execute its upstream stages.
    // A small already-parallel input pays one redundant tiny exchange;
    // a large input (whose scan fills the cores by itself) is skipped.
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes < BigInt(maxSplit) * p) df.repartition(p) else df
  }
}
