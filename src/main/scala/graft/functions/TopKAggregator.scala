package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate. */
case class Scored(id: Long, score: Double)

/** Bounded top-k aggregator: keeps the k best (score, id) pairs per group in
  * a size-capped buffer that merges associatively — so Spark computes top-k
  * with MAP-SIDE partial aggregation (each task reduces its partition to ≤ k
  * candidates before the shuffle) instead of the window-function formulation
  * (`row_number().over(partitionBy(...).orderBy(...))`), which shuffles EVERY
  * candidate row and fully sorts each partition. Same results, bounded
  * memory, shuffle volume k·groups instead of all candidate rows — the 100 TB
  * way to compute per-query nearest neighbors.
  *
  * Ordering: score DESC, then id ASC — identical to the window tie-break used
  * by [[graft.operators.Similarity]], so results are interchangeable.
  */
class TopKAggregator[I](k: Int, extract: I => Scored)
    extends Aggregator[I, Seq[Scored], Seq[Scored]] {

  private val ord: Ordering[Scored] = Ordering.by(s => (-s.score, s.id))

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(buf: Seq[Scored], in: I): Seq[Scored] = {
    val row = extract(in)
    if (buf.size < k) (buf :+ row).sorted(ord)
    else if (ord.lt(row, buf.last)) (buf.init :+ row).sorted(ord)
    else buf
  }

  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[Scored]): Seq[Scored] = buf.sorted(ord)

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
}
