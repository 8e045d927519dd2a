package graft

import org.apache.spark.sql.DataFrame

import graft.operators.TextDedup

/** Stage decomposition of the standalone LSH dedup chain (the q53
  * shape shared by q22/q44/q53/q58/q60/q61/q98/q111/q114/q126/q129):
  * each stage is timed against a PERSISTED and materialized
  * predecessor, so the number is that stage's own cost, not its
  * lineage's. Min-of-`SPARK_GRAFT_REPS` like the bench.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.LshProf"
  */
object LshProf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-lsh-prof",
      Map("spark.sql.maxPlanStringLength" -> "16384"))
    val docs = Tables.documents(spark, dir)
    docs.count() // warm listing

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    val acc = scala.collection.mutable.LinkedHashMap
      .empty[String, Double].withDefaultValue(Double.MaxValue)
    def rec(label: String, dt: Double): Unit =
      acc(label) = math.min(acc(label), dt)

    (1 to reps).foreach { _ =>
      val idx = TextDedup.buildIndex(docs, "doc_id", "text", n = 3, bits = 32)
      idx.persist()
      rec("index (scan+shingle+hash+distinct)", time(noop(idx.df)))
      val sig = TextDedup.minhashSignatures(idx, 32).persist()
      rec("signatures (32 perms agg)", time(noop(sig)))
      val pairs = TextDedup.minhashLshPairs(idx, sig, threshold = 0.05,
        numHashes = 32, bands = 16).persist()
      rec("pairs (band join + jaccard verify)", time(noop(pairs)))
      rec("cc (label propagation)",
        time(noop(TextDedup.connectedComponents(pairs))))
      pairs.unpersist(); sig.unpersist(); idx.unpersist()
      spark.catalog.clearCache()
      System.gc()
    }
    acc.foreach { case (l, dt) => println(f"[lsh-prof] $l%-40s $dt%7.2f s") }
    spark.stop()
  }
}
