package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom filter as a typed Aggregator — the fourth sketch family next to
  * HLL (q13), GK percentiles (q46), and count-min (q54): an m-bit set
  * membership filter with K universal-hash probes per item. Guarantees:
  * NO false negatives ever (every inserted item tests true); false
  * positives at rate ≈ (1 − e^{−Kn/m})^K.
  *
  * The 100 TB role (reference's decontamination concern, SURVEY §2.5
  * Q21-class corpus hygiene): a shingle semi-join against a 10^7-entry
  * eval set shuffles the full corpus shingle relation; a Bloom filter of
  * the same eval set is a ~16 MB broadcast and the corpus-side test is a
  * per-row bitwise probe — no shuffle at all. The exact semi-join then
  * runs only on the ~fp-rate sliver the filter admits (same
  * candidates-then-verify shape as MinHash → exact Jaccard).
  *
  * One pass, fixed 128 KiB buffer, map-side partial merge (bitwise OR —
  * commutative and idempotent, so the filter is deterministic across
  * runs and partitionings; hash seeds are build-time constants).
  */
object BloomAgg extends Aggregator[Long, Array[Long], Array[Long]] {

  val K = 4
  val MBits = 1 << 20 // 2^20 bits = 128 KiB = 16384 longs
  private val P = 2147483647L // 2^31 - 1

  /** Universal-hash coefficients, same construction as CountMinAgg /
    * MinHashLsh (both factors < 2^31 so the product cannot overflow).
    */
  val coeffs: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(131L)
    Array.fill(K)((rnd.nextInt(Int.MaxValue - 1).toLong + 1,
      rnd.nextInt(Int.MaxValue).toLong))
  }

  /** Bit position of probe r for a lifted non-negative hash h. floorMod
    * keeps the position valid for full-range hashes too (same rationale
    * as CountMinAgg.bucket); identical to plain % on lifted inputs.
    */
  def bitPos(h: Long, r: Int): Int =
    (java.lang.Math.floorMod(
      java.lang.Math.floorMod(h, P) * coeffs(r)._1 + coeffs(r)._2, P) % MBits).toInt

  override def zero: Array[Long] = new Array[Long](MBits / 64)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var r = 0
    while (r < K) {
      val p = bitPos(h, r)
      buf(p >>> 6) |= (1L << (p & 63))
      r += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < MBits / 64) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  /** Non-negative murmur3 lift of any column — insertion and probe must
    * use the SAME hash (CountMinAgg.lift pattern).
    */
  def lift(c: Column): Column = hash(c).cast("long") + 2147483648L

  /** Membership probe: tests all K bits of `item` in a `filter` array
    * column. Plain integer/bitwise expressions (shiftright with a
    * per-row shift amount via the SQL function), no UDF — stays inside
    * whole-stage codegen on the corpus scan.
    */
  def mightContain(filter: Column, item: Column): Column = {
    val h = lift(item)
    (0 until K).map { r =>
      val pos = pmod(pmod(pmod(h, lit(P)) * coeffs(r)._1 + coeffs(r)._2,
        lit(P)), lit(MBits))
      val word = element_at(filter, (pos / 64).cast("int") + 1)
      call_function("shiftright", word, pmod(pos, lit(64)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }
}
