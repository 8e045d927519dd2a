package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the scale-aware defaults this engine assumes:
  * AQE on (runtime partition coalescing + skew-join handling), shuffle
  * partitions sized to local cores (a real cluster overrides via conf),
  * UTC session time zone for oracle parity.
  */
object Sessions {
  def local(cores: Int = 32, appName: String = "graft",
      extraConf: Map[String, String] = Map.empty): SparkSession = {
    // Codegen-health observability must be live before the first plan
    // compiles (VERDICT r06: a silent whole-stage fallback survived a
    // fully green gate; the counter makes deoptimization a number).
    CodegenTripwire.install()
    val builder = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Bucketed state dirs (StateLayout) carry up to a few hundred
      // partition dirs per slice; above this threshold Spark runs
      // partition DISCOVERY as a distributed job — pure scheduling
      // overhead per slice read on a local FS (measured on q146's
      // per-increment state reads). Driver-side listing handles
      // hundreds of dirs in microseconds; a real object-store
      // deployment with thousands of partitions lowers it back.
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "512")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    extraConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    // WARN, not ERROR: CodegenTripwire counts WARN-level log lines and
    // logger-level filtering happens BEFORE appenders — a quieter root
    // level would zero the fallback counter while plans silently
    // deoptimize (ADVICE r07).
    spark.sparkContext.setLogLevel("WARN")
    // Plan-shape observability (VERDICT r07 item 2): count corpus-scale
    // single-partition windows per action.
    WindowTripwire.install(spark)
    spark
  }
}
