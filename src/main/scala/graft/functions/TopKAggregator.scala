package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Candidate row for the top-k aggregator: ordered by (value desc,
  * key asc) — ties break deterministically on the key. */
case class Ranked(value: Double, key: Long, payload: String)

/** Bounded top-k as a typed `Aggregator` (the UDAF surface of the
  * engine; SURVEY.md §2.10 notes the reference has none — this is the
  * §7.5 extension shape for "top-k per group" at scale).
  *
  * Versus the window formulation (`row_number() <= k`), the aggregator
  * keeps only k rows per group in its buffer at every point of the
  * partial/final aggregation tree — map-side partials shrink each
  * partition's contribution to k BEFORE the shuffle, so the exchange
  * carries O(groups × k) rows instead of every row. Same results
  * (deterministic total order), verified against the windowed oracle.
  */
class TopKAggregator(k: Int) extends Aggregator[Ranked, Seq[Ranked], Seq[Ranked]] {
  private def best(xs: Seq[Ranked]): Seq[Ranked] =
    xs.sortBy(r => (-r.value, r.key)).take(k)

  override def zero: Seq[Ranked] = Seq.empty
  override def reduce(buf: Seq[Ranked], row: Ranked): Seq[Ranked] = best(buf :+ row)
  override def merge(a: Seq[Ranked], b: Seq[Ranked]): Seq[Ranked] = best(a ++ b)
  override def finish(buf: Seq[Ranked]): Seq[Ranked] = buf
  override def bufferEncoder: Encoder[Seq[Ranked]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Ranked]]()
  override def outputEncoder: Encoder[Seq[Ranked]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Ranked]]()
}
