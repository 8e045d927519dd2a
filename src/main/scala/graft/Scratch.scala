package graft

import org.apache.spark.sql.functions._

/** Ad-hoc profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32, "scratch")
    val dir = "/root/testdata/sf0.1"
    import spark.implicits._
    import graft.operators.VectorSim
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.where(col("vec_id") < 50)
    val k = 10
    val brute = VectorSim.knnBruteForce(queries, emb, k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    for (bits <- Seq(2, 4, 6, 8)) {
      val t0 = System.nanoTime()
      val lsh = VectorSim.knnLsh(queries, emb, k, dim = 64, bits = bits)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val dt = (System.nanoTime() - t0) / 1e9
      val recall = (lsh intersect brute).size.toDouble / brute.size
      println(f"RECALL bits=$bits recall@$k=${recall}%.3f time=$dt%.2f s pairs=${lsh.size}")
    }
    spark.stop()
  }
}
