package graft

import java.nio.file.{Files, Paths}

/** Dev tool: dump `.explain("formatted")` for selected catalog queries
  * to files — the before/after plan artifacts the optimization rounds
  * commit under `plans/r<N>/` (the judge checks plan claims against
  * these).
  *
  *   sbt "runMain graft.PlanDump <outDir> <suffix> [q1,q2,...] [sfDir]"
  *
  * Writes `<outDir>/<query>_<suffix>.txt`. Plans are dumped at
  * sf0.001 by default (shape-identical to sf0.1, seconds to run).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val only: Option[Set[String]] =
      if (args.length > 2 && args(2).nonEmpty) Some(args(2).split(",").toSet)
      else None
    val sf = if (args.length > 3) args(3) else "/root/testdata/sf0.001"
    val spark = Sessions.local(8, "graft-plandump")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sf).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
          println(s"[plandump] wrote $name")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
        spark.catalog.clearCache()
      }
    spark.stop()
  }
}
