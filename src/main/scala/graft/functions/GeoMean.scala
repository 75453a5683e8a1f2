package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (UDAF surface, SURVEY.md §2.4 `udaf_geomean`):
  * geometric mean via sum-of-logs.
  *
  * Scale notes: an `Aggregator` gets planned as a regular Catalyst aggregate
  * with partial (map-side) combine — `reduce` runs per input partition,
  * `merge` combines partial buffers at the exchange, so the shuffle carries
  * one (Double, Long) pair per group per mapper, not raw rows. That is the
  * same contract a built-in `avg` has, and it scales to any group count.
  */
case class LogSumBuf(logSum: Double, n: Long)

object GeoMean extends Aggregator[Double, LogSumBuf, Double] {
  override def zero: LogSumBuf = LogSumBuf(0.0, 0L)
  override def reduce(b: LogSumBuf, x: Double): LogSumBuf =
    LogSumBuf(b.logSum + math.log(x), b.n + 1)
  override def merge(a: LogSumBuf, b: LogSumBuf): LogSumBuf =
    LogSumBuf(a.logSum + b.logSum, a.n + b.n)
  override def finish(b: LogSumBuf): Double =
    if (b.n == 0) Double.NaN else math.exp(b.logSum / b.n)
  override def bufferEncoder: Encoder[LogSumBuf] = Encoders.product[LogSumBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
