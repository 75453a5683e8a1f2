package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One installable group of engine operators.
  *
  * Each key appears in `SparkEntry.queries`; keys with a DuckDB-expressible
  * semantics also appear in `oracles` (SURVEY.md §2 contract). Keys without
  * an oracle (HLL sketches, watermark semantics) are covered by scalatest
  * instead (SURVEY §5).
  */
trait QueryPack {
  type QFn = (SparkSession, String) => DataFrame
  def queries: Map[String, QFn]
  def oracles: Map[String, String]
}
