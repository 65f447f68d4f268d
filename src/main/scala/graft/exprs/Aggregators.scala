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

  case class KmvBuf(hashes: Seq[Long])

  /** KMV (bottom-k / k-minimum-values) distinct-count sketch — the theta-
    * sketch family (Beyer et al., SIGMOD 2007, "On Synopses for Distinct-
    * Value Estimation"): keep the k smallest DISTINCT hash values; with
    * h_k the k-th smallest of the 2^32 hash space, distinct ≈ (k−1)·2^32 /
    * h_k. Unlike HLL, the estimate is a pure function of the hash set, so
    * with a portable hash (first 8 md5 hex digits — [[graft.pack.Packing
    * .stableDraw]]'s formula) the ESTIMATE itself is integer-exact and
    * cross-engine verifiable — the hash-oracle-able mergeable sketch,
    * where `q_hll_sketch` (engine-internal HLL registers) is rows-only
    * by nature.
    *
    * Mergeable: reduce and merge both keep ≤ k sorted distinct hashes, so
    * map-side combine works and the shuffle carries ≤ k longs per group.
    * Estimate: exact observed count while fewer than k distinct hashes
    * have been seen; (k−1)·2^32 div h_k (integer division) after.
    */
  class KmvDistinct(k: Int) extends Aggregator[Long, KmvBuf, Long] {
    private def insert(b: Seq[Long], h: Long): Seq[Long] = {
      // b is sorted ascending and distinct; bounded insert. Fast path:
      // once the buffer is full, a hash >= the current k-th minimum can
      // never enter the bottom-k — O(1) reject for the common case, so
      // the per-row cost is a single comparison once the sketch warms up.
      if (b.size == k && h >= b.last) b
      else if (b.contains(h)) b
      else {
        // positional insert into the sorted seq — no re-sort
        val i = b.indexWhere(_ > h)
        val ins = if (i < 0) b :+ h else (b.take(i) :+ h) ++ b.drop(i)
        if (ins.size > k) ins.take(k) else ins
      }
    }
    override def zero: KmvBuf = KmvBuf(Nil)
    override def reduce(b: KmvBuf, h: Long): KmvBuf = KmvBuf(insert(b.hashes, h))
    override def merge(x: KmvBuf, y: KmvBuf): KmvBuf =
      KmvBuf(y.hashes.foldLeft(x.hashes)(insert))
    override def finish(r: KmvBuf): Long =
      if (r.hashes.size < k) r.hashes.size.toLong
      // h_k = 0 only if the zero hash is among the k smallest (2^-32 per
      // value); clamp to 1 so the division is total — oracle mirrors
      else (k - 1).toLong * 4294967296L / math.max(r.hashes.last, 1L)
    override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}
