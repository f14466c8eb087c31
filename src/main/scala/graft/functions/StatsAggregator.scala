package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.K escape hatch): a custom
  * `Aggregator` with an exact, order-independent buffer so results are
  * oracle-checkable. Values are fixed-point (2 decimals in the harness
  * data); the buffer keeps min/max and a scaled-long sum — no
  * floating-point accumulation order anywhere. */
object StatsAggregator {

  final case class Stats(min: Double, max: Double, mean: Double, n: Long)
  final case class Buf(min: Double, max: Double, sumCents: Long, n: Long)

  /** min/max/mean over a 2-decimal-valued double column. */
  val fixedPointStats: Aggregator[Double, Buf, Stats] =
    new Aggregator[Double, Buf, Stats] {
      def zero: Buf = Buf(Double.MaxValue, Double.MinValue, 0L, 0L)
      def reduce(b: Buf, v: Double): Buf =
        Buf(math.min(b.min, v), math.max(b.max, v),
          b.sumCents + math.round(v * 100), b.n + 1)
      def merge(a: Buf, b: Buf): Buf =
        Buf(math.min(a.min, b.min), math.max(a.max, b.max),
          a.sumCents + b.sumCents, a.n + b.n)
      def finish(b: Buf): Stats =
        if (b.n == 0) Stats(Double.NaN, Double.NaN, Double.NaN, 0L)
        else Stats(b.min, b.max, (b.sumCents / 100.0) / b.n, b.n)
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
    }
}
