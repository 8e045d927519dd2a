package graft

/** Ad-hoc profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32, "scratch")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIME $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    Tables.documents(spark, dir).count()
    (1 to 3).foreach { i =>
      Seq("q21_ngram_jaccard", "q22_minhash_lsh", "q23_simhash").foreach { q =>
        time(s"$q #$i")(SparkEntry.queries(q)(spark, dir).count())
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
