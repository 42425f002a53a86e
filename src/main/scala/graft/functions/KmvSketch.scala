package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/**
 * KMV (k-minimum-values) distinct-count sketch as a typed Aggregator: the
 * state is the k smallest DISTINCT hash values seen — bounded (k strings),
 * commutative and associative under merge, so the sketch is identical at
 * any parallelism and any arrival order. This is the mergeable sketch a
 * 10^12-row distinct count uses when `countDistinct`'s exact shuffle is
 * too expensive and `approx_count_distinct`'s HLL state is not
 * deterministic enough to oracle-check: the KMV state itself is an exact,
 * reproducible set (row_number-over-hash in SQL), and the cardinality
 * estimate is a pure function of it.
 *
 * Inputs are hash strings (md5 hex in this repo's discipline — uniform and
 * reproducible in DuckDB); nulls are ignored.
 */
class KmvSketch(k: Int) extends Aggregator[String, List[String], Seq[String]] {
  require(k >= 1)
  override def zero: List[String] = Nil

  // sorted ascending, distinct, size <= k
  override def reduce(b: List[String], h: String): List[String] =
    if (h == null) b else insert(b, h)

  // the profiler's per-row inner loop at the 100-TB tier: reject above-
  // k-th-minimum rows BEFORE any allocation (for a full sketch that is
  // almost every row — the accept probability decays as k/n), and insert
  // in place instead of re-sorting the whole list. State contract
  // (sorted ascending, distinct, <= k) is unchanged, so sketches stay
  // bit-identical to the naive form (q_agg_kmv hash-checked).
  private def insert(b: List[String], h: String): List[String] = {
    val n = b.length
    // zero-alloc fast path: a full sketch rejects anything >= its k-th
    // minimum (almost every row once n >> k — accept probability ~ k/n);
    // h == last is the duplicate-of-last case, also state-unchanged
    if (n >= k && h.compareTo(b.last) >= 0) return b
    val (lt, geq) = b.span(_.compareTo(h) < 0)
    if (geq.nonEmpty && geq.head == h) return b // duplicate
    val merged = lt ::: (h :: geq)              // in-place ordered insert
    if (n + 1 > k) merged.take(k) else merged
  }

  override def merge(a: List[String], b: List[String]): List[String] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(r: List[String]): Seq[String] = r
  override def bufferEncoder: Encoder[List[String]] =
    ExpressionEncoder[List[String]]()
  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}

object KmvSketch {
  /** Cardinality estimate from a full sketch: (k-1) / fraction of the hash
    * space covered by the k-th minimum. With fewer than k values the
    * sketch IS the distinct set and the count is exact. Hash fraction uses
    * the first 15 hex digits (60 bits — exact in a double's mantissa). */
  def estimate(sketch: Seq[String], k: Int): Double = {
    if (sketch.length < k) sketch.length.toDouble
    else {
      val kth = java.lang.Long.parseLong(sketch.last.take(15), 16)
      val frac = kth.toDouble / (1L << 60).toDouble
      (k - 1) / frac
    }
  }
}
