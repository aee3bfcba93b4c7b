package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregation (builder mandate §2.10): bounded top-k per group
  * as an `Aggregator`, registered through `udaf()`.
  *
  * Each buffer holds at most k (sortKey, id) pairs ordered by (sortKey DESC,
  * id ASC), so partial aggregation bounds both memory and shuffle bytes at
  * O(k) per group-partition — the scale advantage over the window
  * row_number() formulation, which shuffles every row and sorts whole
  * partitions before discarding all but k. Deterministic: keys are exact
  * longs (grid-snapped upstream) and ties break on id.
  *
  * Output is the comma-joined id list (canonical string — survives the
  * driver's hash compare unlike nested arrays).
  */
case class TopKAgg(k: Int) extends Aggregator[(Long, Long), Seq[(Long, Long)], String] {

  private def ord: Ordering[(Long, Long)] = Ordering.by { case (key, id) => (-key, id) }

  override def zero: Seq[(Long, Long)] = Seq.empty

  override def reduce(buf: Seq[(Long, Long)], in: (Long, Long)): Seq[(Long, Long)] =
    (buf :+ in).sorted(ord).take(k)

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[(Long, Long)]): String =
    buf.map(_._2).mkString(",")

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
