package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a Spark `Aggregator` — the bounded
  * summary that finds frequent tokens WITHOUT shuffling the token stream or
  * materializing the vocabulary (`text_vocab`'s exact formulation shuffles
  * one row per distinct term; fine for a bounded vocab, prohibitive for
  * open-vocabulary corpora — URLs, code identifiers, typos — at 100 TB).
  *
  * Uses the mergeable-summaries formulation (Agarwal, Cormode, Huang,
  * Phillips, Wei, Yi — "Mergeable Summaries", PODS 2012):
  *
  *  - reduce: increment the token's counter; if absent and the sketch is
  *    full, decrement ALL counters by 1 (dropping zeros) — the classic
  *    Misra-Gries step.
  *  - merge: add counters pointwise; if more than `m` survive, subtract the
  *    (m+1)-th largest count from every counter and drop the non-positive —
  *    preserving the error bound across arbitrary merge trees.
  *
  * Guarantees after any reduce/merge order over N tokens: every counter
  * underestimates its token's true count by at most N/(m+1), and any token
  * with true count > N/(m+1) is present in the sketch. When the distinct
  * token count never exceeds `m`, no eviction ever fires and the sketch IS
  * the exact count map.
  *
  * Each task reduces its partition to a ≤ m-entry map before the shuffle
  * (partial aggregation), so a 1000-executor global sketch moves
  * tasks × m tiny entries — never the corpus.
  */
class HeavyHittersAggregator(m: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], token: String): Map[String, Long] =
    buf.get(token) match {
      case Some(c)              => buf.updated(token, c + 1)
      case None if buf.size < m => buf.updated(token, 1L)
      case None =>
        buf.collect { case (t, c) if c > 1 => t -> (c - 1) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (combined.size <= m) combined
    else {
      // (m+1)-th largest count — subtracting it keeps the m survivors and
      // carries the undercount into the error budget, never over it
      val kth = combined.values.toIndexedSeq.sorted(Ordering[Long].reverse)(m)
      combined.collect { case (t, c) if c > kth => t -> (c - kth) }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
