package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed UDAF (SURVEY §2.8): geometric mean via sum-of-logs.
  * An `Aggregator` participates in partial aggregation: `reduce` runs
  * map-side per partition, `merge` combines partition buffers at the
  * exchange — same two-phase shape as built-in aggregates, so the shuffle
  * carries one (sumLn, n) pair per group per partition, not raw rows.
  *
  * Non-positive inputs are SKIPPED, matching the SQL twin
  * `exp(avg(ln(x)))` where ln(x<=0) is null and avg ignores nulls —
  * previously a single 0 collapsed the whole group to 0.0 and a negative
  * poisoned it to NaN. (A SQL null reaching the primitive Double encoder
  * arrives as 0.0 and is therefore also skipped, same as the twin.) */
case class GeoAcc(sumLn: Double, n: Long)

object GeoMean extends Aggregator[Double, GeoAcc, Double] {
  override def zero: GeoAcc = GeoAcc(0.0, 0L)
  override def reduce(b: GeoAcc, a: Double): GeoAcc =
    if (a > 0.0) GeoAcc(b.sumLn + math.log(a), b.n + 1) else b
  override def merge(x: GeoAcc, y: GeoAcc): GeoAcc =
    GeoAcc(x.sumLn + y.sumLn, x.n + y.n)
  override def finish(b: GeoAcc): Double =
    if (b.n == 0) Double.NaN else math.exp(b.sumLn / b.n)
  override def bufferEncoder: Encoder[GeoAcc] = Encoders.product[GeoAcc]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
