package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact top-k values per group as a typed Aggregator — the
  * scale-correct replacement for the `row_number` window when k is
  * small: a window sorts and ships EVERY row of every group through the
  * shuffle, while this carries a bounded k-element buffer with map-side
  * partial merge, so shuffle volume is k·groups regardless of group
  * size (the same partial-aggregate shape as min/max, generalized to
  * the k largest).
  *
  * The buffer is a descending-sorted array capped at k; reduce is a
  * binary-search insert, merge is a linear merge of two sorted runs —
  * both O(k). Duplicates are kept (top-k VALUES, row multiplicity
  * preserved), which makes the result a pure function of the group's
  * value multiset: no ordering ambiguity, engine-stable.
  */
final class TopKAgg(k: Int) extends Aggregator[Double, Array[Double], Array[Double]] {
  require(k > 0)

  override def zero: Array[Double] = Array.emptyDoubleArray

  override def reduce(buf: Array[Double], v: Double): Array[Double] = {
    if (buf.length == k && v <= buf(k - 1)) return buf
    // insertion point in the descending buffer
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) >= v) lo = mid + 1 else hi = mid
    }
    val n = math.min(buf.length + 1, k)
    val out = new Array[Double](n)
    System.arraycopy(buf, 0, out, 0, lo)
    if (lo < n) {
      out(lo) = v
      System.arraycopy(buf, lo, out, lo + 1, n - lo - 1)
    }
    out
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    val n = math.min(a.length + b.length, k)
    val out = new Array[Double](n)
    var i = 0; var j = 0; var o = 0
    while (o < n) {
      if (j >= b.length || (i < a.length && a(i) >= b(j))) { out(o) = a(i); i += 1 }
      else { out(o) = b(j); j += 1 }
      o += 1
    }
    out
  }

  override def finish(buf: Array[Double]): Array[Double] = buf

  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
