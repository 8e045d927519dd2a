package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole (forked) test JVM. */
object TestSpark {
  lazy val spark: SparkSession = Sessions.local(4, "graft-test")

  /** Fresh temp dir under target/ (kept out of git). */
  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
