package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed `Aggregator` (the custom-aggregation slot
  * SURVEY.md §7.3 reserves for north-star ops): each partition keeps only
  * its local k best (id, score) pairs, merges are k-way truncations, so a
  * per-group top-k never materializes the group — the streaming-friendly
  * alternative to sort-within-group at 100 TB.
  *
  * Ordering is (score desc, id asc): associative + commutative merge with a
  * total order → result is deterministic under any partitioning.
  */
case class TopKByScore(k: Int)
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {
  require(k > 0, s"k=$k must be positive") // k=0 would crash reduce's b.last

  private def best(xs: Seq[(Long, Double)]): Seq[(Long, Double)] =
    xs.sortBy { case (id, score) => (-score, id) }.take(k)

  // the buffer invariant: always sorted (score desc, id asc) and ≤ k long —
  // reduce can then early-out on a non-qualifying row in O(1) instead of
  // re-sorting the whole buffer per input (O(k log k) per ROW, the slow
  // path at large k)
  private def beats(a: (Long, Double), tail: (Long, Double)): Boolean =
    a._2 > tail._2 || (a._2 == tail._2 && a._1 < tail._1)

  override def zero: Seq[(Long, Double)] = Nil
  override def reduce(b: Seq[(Long, Double)], a: (Long, Double)) =
    if (b.length >= k && !beats(a, b.last)) b
    else best(b :+ a)
  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]) = best(a ++ b)
  override def finish(r: Seq[(Long, Double)]): Seq[(Long, Double)] = r
  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
}
