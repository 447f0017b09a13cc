package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregation surface (`Aggregator[IN, BUF, OUT]`): exact
  * decimal-routed count/total/mean. The buffer is a monoid over exact
  * decimals, so partial aggregation and merges compose independent of
  * order — which is exactly what makes the result verifiable against an
  * independent engine (and safe as streaming state).
  */
final case class StatsBuf(n: Long, sum: BigDecimal)
final case class Stats(n: Long, total: Double, mean: Double)

object StatsAgg extends Aggregator[Double, StatsBuf, Stats] {
  type Buf = StatsBuf

  private val S = 6 // matches the oracle's DECIMAL(28,6) routing

  override def zero: StatsBuf = StatsBuf(0L, BigDecimal(0))

  override def reduce(b: StatsBuf, x: Double): StatsBuf =
    StatsBuf(b.n + 1, b.sum + BigDecimal(x).setScale(S, BigDecimal.RoundingMode.HALF_UP))

  override def merge(a: StatsBuf, b: StatsBuf): StatsBuf = StatsBuf(a.n + b.n, a.sum + b.sum)

  override def finish(b: StatsBuf): Stats = {
    val total = b.sum.toDouble
    Stats(b.n, total, if (b.n == 0) 0.0 else total / b.n)
  }

  override def bufferEncoder: Encoder[StatsBuf] = Encoders.product[StatsBuf]
  override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
}
