package graft.exprs

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregators — the extension surface for aggregate-shaped custom
  * ops (SURVEY.md §2.F: future aggregate commands map to
  * `Aggregator[IN, BUF, OUT]`). The buffer is a bounded product type, so
  * partial aggregation (map-side combine) works: each partition keeps at
  * most k entries and merges are k+k → k — the shuffle carries k rows per
  * group, never the group's contents.
  */
object Aggregators {

  case class KV(k: Long, v: Double)
  case class TopKBuf(items: Seq[KV])

  /** Exact per-group top-k by value (desc, key tiebreak). */
  class TopKByValue(k: Int) extends Aggregator[KV, TopKBuf, Seq[KV]] {
    private def insert(b: Seq[KV], a: KV): Seq[KV] =
      ((a +: b).sortBy(x => (-x.v, x.k))).take(k)
    override def zero: TopKBuf = TopKBuf(Nil)
    override def reduce(b: TopKBuf, a: KV): TopKBuf = TopKBuf(insert(b.items, a))
    override def merge(x: TopKBuf, y: TopKBuf): TopKBuf =
      TopKBuf(y.items.foldLeft(x.items)(insert))
    override def finish(r: TopKBuf): Seq[KV] = r.items.sortBy(x => (-x.v, x.k))
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[Seq[KV]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[KV]]()
  }
}
