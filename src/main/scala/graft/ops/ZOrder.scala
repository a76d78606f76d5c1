package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout: interleave the bits of two dimension keys so
  * that sorting/partitioning by the z-value clusters rows that are close
  * in BOTH dimensions — multi-dimensional data skipping for scans that
  * filter on either or both columns (the technique behind Delta/Iceberg
  * `OPTIMIZE ZORDER`). Laid out this way, a 2-d box predicate touches
  * only the partitions whose z-range intersects the box instead of the
  * whole table; single-dimension layouts can only skip on their one
  * column.
  *
  * Everything here is plain integer arithmetic — the z-value is
  * engine-portable (the oracle recomputes it in SQL) and the layout is
  * a deterministic function of the data.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative ints:
    * bit i of x lands at 2i, bit i of y at 2i+1.
    */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      (shiftright(x, i).bitwiseAND(lit(1)) * lit(1L << (2 * i))) +
        (shiftright(y, i).bitwiseAND(lit(1)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _).cast("long")

  /** Quantize a numeric column to `bits` bits over [min, max] — the
    * range comes from table stats (min/max), a one-row aggregate at
    * layout time, not per query.
    */
  def quantize(c: Column, min: Double, max: Double, bits: Int): Column = {
    val buckets = (1 << bits).toDouble
    least(greatest(
      floor((c - lit(min)) / lit(max - min + 1e-9) * buckets), lit(0.0)),
      lit(buckets - 1)).cast("int")
  }

  /** Write `df` partitioned by the top `log2(nBuckets)` bits of the
    * z-value of the two (already-quantized, `bits`-bit) dimension
    * columns. Scans with predicates on either dimension restricted to a
    * sub-range then prune whole z-bucket partitions (visible as
    * PartitionFilters in the scan).
    */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String, bits: Int,
      nBuckets: Int, path: String): Unit = {
    val shift = 2 * bits - (31 - Integer.numberOfLeadingZeros(nBuckets))
    df.withColumn("z", zValue(col(xCol), col(yCol), bits))
      .withColumn("z_bucket", shiftright(col("z"), shift))
      .repartition(col("z_bucket"))
      .write.mode("overwrite").partitionBy("z_bucket").parquet(path)
  }

  /** The z-bucket range [lo, hi] that fully covers a 2-d box
    * [x0,x1]×[y0,y1] in quantized coordinates — conservative (a z-range
    * may include out-of-box cells; the residual predicate still applies)
    * but never misses a row, because z is monotone in each dimension
    * when the other is fixed at its extreme.
    */
  def bucketRange(x0: Int, x1: Int, y0: Int, y1: Int, bits: Int,
      nBuckets: Int): (Long, Long) = {
    val shift = 2 * bits - (31 - Integer.numberOfLeadingZeros(nBuckets))
    def z(x: Int, y: Int): Long =
      (0 until bits).map { i =>
        (((x >> i) & 1).toLong << (2 * i)) | (((y >> i) & 1).toLong << (2 * i + 1))
      }.sum
    (z(x0, y0) >> shift, z(x1, y1) >> shift)
  }
}
