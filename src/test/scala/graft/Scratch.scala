package graft

import org.apache.spark.sql.functions._

/** Ad-hoc profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32, "scratch")
    val dir = "/root/testdata/sf0.1"
    import graft.operators.TextDedup
    // Skewed-df corpus: every doc carries the same hot footer phrase
    // (Zipfian stopword-shingle regime: footer shingles have df = n).
    val docs = Tables.documents(spark, dir)
      .withColumn("text",
        concat(col("text"), lit(" common footer marker words appear everywhere here")))
    val idx = TextDedup.buildIndex(docs, "doc_id", "text", n = 3, bits = 64).persist()
    println(s"INDEX rows=${idx.df.count()}")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (t <- Seq(0.35, 0.5, 0.8)) {
      val c = TextDedup.prefixCandidates(idx.df, t).count()
      println(s"PREFIXCAND t=$t -> $c")
      time(s"skewed prefix t=$t") { noop(TextDedup.ngramJaccardPrefix(idx, t)) }
      time(s"skewed direct t=$t") { noop(TextDedup.ngramJaccardDirect(idx, t)) }
    }
    idx.unpersist()
    spark.stop()
  }
}
