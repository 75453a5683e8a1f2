package graft

/** Prints the measured inventory sizes — SURVEY §2's totals MUST be
  * copied from this output, never hand-tallied (r1 and r8 verdicts both
  * caught hand-tally drift). */
object CountProbe {
  def main(args: Array[String]): Unit = {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    println(s"QUERIES=${q.size}")
    println(s"ORACLES=${o.size}")
    println(s"NO_ORACLE=${(q -- o).toSeq.sorted.mkString(",")}")
    val orphans = o -- q
    if (orphans.nonEmpty) println(s"ORPHAN_ORACLES=${orphans.toSeq.sorted.mkString(",")}")
  }
}
