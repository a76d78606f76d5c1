package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (the engine's UDAF surface, SURVEY §2.3):
  * SimHash vote accumulation as ONE Aggregator instead of 64 separate
  * sum() columns — per input hash it updates a 64-int vote buffer in a
  * single pass and emits the packed 64-bit signature on finish.
  *
  * Runs as a TypedImperativeAggregate under ObjectHashAggregate: the
  * buffer lives as a JVM object per group, map-side partial merge works
  * (reduce + merge are both implemented), and the buffer serializes
  * only on spill/shuffle.
  */
object SimHashAgg extends Aggregator[Long, Array[Int], Long] {

  override def zero: Array[Int] = new Array[Int](64)

  override def reduce(buf: Array[Int], h: Long): Array[Int] = {
    var b = 0
    while (b < 64) {
      if (((h >>> b) & 1L) == 1L) buf(b) += 1 else buf(b) -= 1
      b += 1
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Int]): Long = {
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (buf(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
