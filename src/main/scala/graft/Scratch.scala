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
    import graft.functions.TextFunctions._
    val docs = Tables.documents(spark, dir)
    time("docs.count")(docs.count())
    time("docs.count2")(docs.count())
    time("q20 exact")(queries.ExtQueries.q20ExactDedup(spark, dir).count())
    time("q20 exact again")(queries.ExtQueries.q20ExactDedup(spark, dir).count())
    val sets = docs.select(col("doc_id"), wordShingles(tokens(col("text")), 3).as("shingles"))
    time("shingles only")(sets.count())
    time("bandkeys")(sets.select(col("doc_id"),
      explode(minhashBandKeys(col("shingles"), 32, 16)).as("bucket")).count())
    time("q22 full")(queries.ExtQueries.q22MinhashLsh(spark, dir).count())
    time("q23 full")(queries.ExtQueries.q23Simhash(spark, dir).count())
    time("q24 full")(queries.ExtQueries.q24EmbeddingNearDup(spark, dir).count())
    spark.stop()
  }
}
