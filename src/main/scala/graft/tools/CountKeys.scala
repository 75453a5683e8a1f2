package graft.tools
object CountKeys {
  def main(args: Array[String]): Unit = {
    println(s"KEYS=${graft.SparkEntry.queries.size} ORACLES=${graft.SparkEntry.oracleSql.size}")
    val noOracle = graft.SparkEntry.queries.keySet -- graft.SparkEntry.oracleSql.keySet
    println(s"NO_ORACLE=${noOracle.toSeq.sorted.mkString(",")}")
  }
}
