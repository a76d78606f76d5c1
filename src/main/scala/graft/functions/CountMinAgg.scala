package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch as a typed Aggregator (the third sketch family next
  * to HLL (q13) and GK percentiles (q46)): a D×W counter matrix; each
  * input increments one counter per row, chosen by an independent
  * universal hash. The estimate for an item is the MIN over its D
  * counters — never below the true count, above it by at most εN
  * (ε = e/W) with probability 1−e^{−D}. One pass, fixed 32 KB buffer,
  * map-side partial merge (element-wise add) — the sketch shape that
  * replaces exact per-item counts when the vocabulary doesn't fit
  * memory at 100 TB.
  *
  * Hash seeds are build-time constants, so the sketch — and every
  * estimate — is deterministic across runs and partitionings.
  */
object CountMinAgg extends Aggregator[Long, Array[Long], Array[Long]] {

  val D = 4
  val W = 1024
  private val P = 2147483647L // 2^31 - 1

  /** Universal-hash coefficients, same construction as MinHashLsh. */
  val coeffs: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(97L)
    Array.fill(D)((rnd.nextInt(Int.MaxValue - 1).toLong + 1,
      rnd.nextInt(Int.MaxValue).toLong))
  }

  /** Row r's bucket for a lifted murmur3 hash h (both factors < 2^31,
    * so the product cannot overflow Long — see MinHashLsh). floorMod
    * keeps the bucket in range for FULL-RANGE hashes too (a SQL user
    * feeding xxhash64 instead of [[lift]] must get a valid — if
    * differently-distributed — sketch, not an array crash); for the
    * lift contract's non-negative inputs it equals plain %.
    */
  def bucket(h: Long, r: Int): Int =
    (java.lang.Math.floorMod(
      java.lang.Math.floorMod(h, P) * coeffs(r)._1 + coeffs(r)._2, P) % W).toInt

  override def zero: Array[Long] = new Array[Long](D * W)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var r = 0
    while (r < D) {
      buf(r * W + bucket(h, r)) += 1L
      r += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < D * W) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  /** Non-negative murmur3 lift of any column — the aggregator's input
    * and the estimate lookup must use the SAME hash.
    */
  def lift(c: Column): Column = hash(c).cast("long") + 2147483648L

  /** Estimate column: min over the D counters of `item` in a `sketch`
    * array column — plain integer expressions, no UDF.
    */
  def estimate(sketch: Column, item: Column): Column = {
    val h = lift(item)
    val terms = (0 until D).map { r =>
      val idx = pmod(pmod(pmod(h, lit(P)) * coeffs(r)._1 + coeffs(r)._2,
        lit(P)), lit(W))
      element_at(sketch, (idx + lit(r * W + 1)).cast("int"))
    }
    least(terms: _*)
  }
}
