package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Scored candidate for top-k aggregation. */
case class ScoredId(score: Double, id: Long)

/** Bounded top-k aggregator: keeps at most k (score desc, id asc) pairs,
  * pruning lazily at 4k to amortize sorting.
  *
  * This is the ANN scale path: `row_number().over(Window.partitionBy(q))`
  * must shuffle EVERY scored (query, candidate) pair into one partition per
  * query — at 10^8 candidates × Q queries that's the whole score matrix
  * through the network into Q skewed reducers. A typed Aggregator gets
  * map-side partial aggregation: each task reduces its slice to k rows per
  * query before the exchange, so the shuffle carries Q×k rows total.
  * Ordering (score desc, id asc) matches the window form exactly, so results
  * are interchangeable.
  */
class TopKAgg(k: Int) extends Aggregator[ScoredId, List[ScoredId], Seq[ScoredId]] {

  private def top(l: List[ScoredId]): List[ScoredId] =
    l.sortBy(s => (-s.score, s.id)).take(k)

  override def zero: List[ScoredId] = Nil

  override def reduce(b: List[ScoredId], a: ScoredId): List[ScoredId] = {
    val l = a :: b
    if (l.length > 4 * k) top(l) else l
  }

  override def merge(x: List[ScoredId], y: List[ScoredId]): List[ScoredId] = {
    val l = x ++ y
    if (l.length > 4 * k) top(l) else l
  }

  override def finish(r: List[ScoredId]): Seq[ScoredId] = top(r)

  override def bufferEncoder: Encoder[List[ScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}

object TopKAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.udaf

  /** Column form: `topK(5)(score, id)` → array<struct<score,id>> (the udaf
    * flattens the case-class input into one parameter per field).
    */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAgg(k))
    (score, id) => fn(score, id)
  }
}
