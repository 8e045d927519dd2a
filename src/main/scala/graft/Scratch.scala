package graft

import org.apache.spark.sql.functions._

/** Ad-hoc profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32, "scratch")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIME $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    // Scale stress: replicate documents 10x (50k docs) with distinct ids
    // and perturbed text (suffix word per replica so replicas are
    // near-dups of the original, not exact dups).
    val docs = Tables.documents(spark, dir)
    val big = docs
      .crossJoin(spark.range(10).withColumnRenamed("id", "rep"))
      .select(
        (col("doc_id") * 10 + col("rep")).as("doc_id"),
        concat(col("text"), lit(" rep"), col("rep")).as("text"))
    big.write.mode("overwrite").parquet("/tmp/docs50k")
    val d50 = spark.read.parquet("/tmp/docs50k")
    println(s"docs50k rows=${d50.count()}")

    import graft.operators.TextDedup
    time("exact 50k")(TextDedup.exact(d50, "doc_id", "text").count())
    time("minhash_lsh 50k")(TextDedup.minhashLshPairs(d50, "doc_id", "text", 3, 0.5).count())
    spark.catalog.clearCache()
    time("minhash_lsh 50k rerun")(TextDedup.minhashLshPairs(d50, "doc_id", "text", 3, 0.5).count())
    spark.catalog.clearCache()
    time("simhash 50k")(TextDedup.simhashPairs(d50, "doc_id", "text", 3).count())
    spark.catalog.clearCache()
    time("ngram exact 50k")(TextDedup.ngramJaccardPairs(d50, "doc_id", "text", 3, 0.5).count())
    spark.stop()
  }
}
