package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Memory-pressure posture row (VERDICT r09 item 6): the 128 GiB
  * sandbox never exercises SPILL, so "the plans survive constrained
  * memory" was an untested claim — a plan can be shuffle-clean and
  * still die on a 4 GiB executor if an aggregate or sort assumes its
  * whole partition fits in RAM. This main runs the dedup-report
  * family's chain (the q58/q60 shape: shingle index -> MinHash
  * signatures -> banded LSH pairs -> connected components -> survivor
  * pick) over the 10x replicated corpus in a session whose unified
  * memory manager is capped via `spark.testing.memory` (the knob
  * Spark's own tests size the manager with) — default 1 GiB over 8
  * task slots, the corpus/memory RATIO that genuinely pressures this
  * SF (see the sizing comment in `main`; the reference's literal
  * 4 GiB completes spill-free here and would test nothing) —
  * asserting green completion and recording the
  * spill the cap forces. Nonzero spill is the point: the operators hit
  * the memory ceiling and DEGRADE (sort/aggregate spill to disk)
  * instead of failing — the posture a 1000-executor deployment's worst
  * skewed task needs.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.MemPressureStress"
  */
object MemPressureStress {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_STRESS_REPS", "10").toInt
    val memCap = sys.env.getOrElse("SPARK_GRAFT_MEM_CAP_MB", "1024").toLong
    // Default cap 1 GiB: what matters is the CORPUS/MEMORY RATIO, not
    // the absolute number — the 10x sf0.1 corpus under 1 GiB exercises
    // the same per-task pressure a reference-sized 4 GiB executor sees
    // at ~4x the data (the 4 GiB run at this SF completes spill-free,
    // i.e. tests nothing). Cap adjustable via SPARK_GRAFT_MEM_CAP_MB.
    val spark = Sessions.local(8, "graft-mem-pressure", Map(
      "spark.testing.memory" -> (memCap << 20).toString,
      "spark.sql.shuffle.partitions" -> "8"))
    val spillMem = new AtomicLong(0L)
    val spillDisk = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) {
          spillMem.addAndGet(e.taskMetrics.memoryBytesSpilled)
          spillDisk.addAndGet(e.taskMetrics.diskBytesSpilled)
        }
    })
    val docs = Tables.documents(spark, dir)
    val big = (0 until reps).map { i =>
      docs.select(
        (col("doc_id") * reps + i).as("doc_id"),
        (if (i == 0) col("text")
         else concat(col("text"), lit(s" replicamarker$i"))).as("text"))
    }.reduce(_ unionByName _)

    val t0 = System.nanoTime()
    val idx = operators.TextDedup
      .buildIndex(big, "doc_id", "text", n = 3, bits = 32).persist()
    val clusters = operators.TextDedup.connectedComponents(
      operators.TextDedup.minhashLshPairs(idx, 0.05, numHashes = 32, bands = 16))
      .persist()
    val nClusters = clusters.select(col("canonical_id")).distinct().count()
    val quality = operators.TextAnalysis
      .qualityScore(big, "doc_id", "text")
      .select(col("doc_id"), col("quality_score"))
    val survivors = operators.TextDedup
      .dedupSurvivors(clusters, quality, "quality_score")
    val nSurvivors = survivors.count()
    val dt = (System.nanoTime() - t0) / 1e9

    org.apache.spark.graft.SparkShims.waitUntilListenerBusEmpty(spark, 30000L)
    val memMb = spillMem.get >> 20
    val diskMb = spillDisk.get >> 20
    println(f"mem-pressure dedup report (${memCap} MiB cap, ${reps}x) $dt%7.1f s" +
      f"  clusters=$nClusters survivors=$nSurvivors" +
      f"  spill mem=${memMb}MB disk=${diskMb}MB")
    require(nClusters > 0 && nSurvivors > 0,
      "constrained run must still produce the dedup report")
    require(spillMem.get > 0L,
      s"the $memCap MiB cap must actually force spill — a zero here means the " +
        "row stopped testing memory pressure (corpus too small for the cap?)")
    idx.df.unpersist(); clusters.unpersist()
    spark.stop()
  }
}
