package graft.tmp
import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}
import graft.pipeline.CurationRun
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import scala.collection.concurrent.TrieMap
object DebugQ146 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32, "debug-q146",
      Map("spark.sql.maxPlanStringLength" -> "16384"))
    val dir = "/root/testdata/sf0.1"
    val starts = TrieMap[Int, (Long, String)]()
    val agg = TrieMap[String, (Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        starts(e.jobId) = (System.nanoTime(), {
          import scala.jdk.CollectionConverters._
          val ks = e.properties.stringPropertyNames().asScala
          Option(e.properties.getProperty("callSite.short"))
            .orElse(Option(e.properties.getProperty("spark.job.description")))
            .map(_.take(100))
            .getOrElse(ks.mkString(",").take(150))
        })
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        starts.remove(e.jobId).foreach { case (t0, site) =>
          val dt = System.nanoTime() - t0
          val (s, n) = agg.getOrElse(site, (0L, 0))
          agg(site) = (s + dt, n + 1)
        }
    })
    def t[A](label: String)(f: => A): A = {
      agg.clear()
      val t0 = System.nanoTime(); val r = f
      org.apache.spark.graft.SparkShims.waitUntilListenerBusEmpty(spark, 30000)
      println(f"[dbg] $label%-12s ${(System.nanoTime()-t0)/1e9}%6.1f s")
      agg.toSeq.sortBy(-_._2._1).take(18).foreach { case (site, (s, n)) =>
        println(f"[dbg]    ${s/1e9}%6.2f s  x$n%-3d $site")
      }
      r
    }
    val docs = Tables.documents(spark, dir)
    val bench = docs.where(pmod(col("doc_id"), lit(97)) === 0)
    val corpus = docs.where(pmod(col("doc_id"), lit(97)) =!= 0).persist()
    corpus.count()
    def b(i: Int) = corpus.where(pmod(col("doc_id"), lit(3)) === i)
    val emb = Tables.embeddings(spark, dir)
    val base = "/tmp/dbg_q146b"
    t("init") { CurationRun.runInit(b(0), bench, s"$base/out0", s"$base/state0",
      minQuality = 0.75, minContaminatedShingles = 1,
      fractions = Map("en" -> 0.5), defaultFraction = 0.9,
      embeddings = Some(emb), semClusters = 8, semThreshold = 0.35,
      semanticState = true, annState = true, annSubspaces = 4,
      annCodewords = 8, annClusters = 4, annIters = 2,
      spanState = true, lineState = true) }
    t("inc1") { CurationRun.runIncremental(b(1), bench, s"$base/out1",
      s"$base/state0", s"$base/state1",
      minQuality = 0.75, minContaminatedShingles = 1,
      fractions = Map("en" -> 0.5), defaultFraction = 0.9,
      embeddings = Some(emb), semClusters = 8, semThreshold = 0.35) }
    spark.stop()
  }
}
