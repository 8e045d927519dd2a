package graft

// Scratch: print one oracle SQL to stdout — delete after use.
object DumpOracle {
  def main(args: Array[String]): Unit =
    println(SparkEntry.oracleSql(args(0)))
}
