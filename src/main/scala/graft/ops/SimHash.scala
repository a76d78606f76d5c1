package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** SimHash near-duplicate detection (64-bit) with pigeonhole-chunked
  * candidate generation.
  *
  * Signature: per token, xxhash64; each of the 64 bit positions votes
  * ±1; the sign of the per-document vote sum sets the signature bit.
  * Similar token multisets → small Hamming distance.
  *
  * Pair generation never goes O(n²): split the 64-bit signature into
  * (maxHamming + 1) chunks — two signatures within maxHamming Hamming
  * distance must agree on at least one whole chunk (pigeonhole), so a
  * join on (chunkIdx, chunkValue) finds every qualifying pair; popcount
  * on the XOR verifies. Chunk-join fan-out is bounded by chunk-value
  * collision rates, not by corpus size.
  */
object SimHash {

  /** (id, simhash: Long). */
  def signatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokens = docs
      .select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val votes: Seq[Column] = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$b")
    }
    val sums = tokens.groupBy(col("id")).agg(votes.head, votes.tail: _*)
    val sig = (0 until 64).map { b =>
      when(col(s"v$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce((a: Column, c: Column) => a.bitwiseOR(c))
    sums.select(col("id"), sig.as("simhash"))
  }

  /** Pairs (id_a < id_b) with Hamming(simhash) <= maxHamming. */
  def pairs(sigs: DataFrame, maxHamming: Int): DataFrame = {
    val chunks = maxHamming + 1
    require(64 % chunks == 0,
      s"maxHamming + 1 must divide 64 (got $chunks) so chunks tile the signature")
    val width = 64 / chunks
    val chunked = sigs.select(col("id"), col("simhash"),
      explode(array((0 until chunks).map { cIdx =>
        struct(lit(cIdx).as("c"),
          shiftright(col("simhash"), cIdx * width)
            .bitwiseAND((1L << width) - 1).as("v"))
      }: _*)).as("ch"))
      .select(col("id"), col("simhash"), col("ch.c").as("c"), col("ch.v").as("v"))
    val l = chunked.select(col("id").as("doc_id_a"), col("simhash").as("sa"),
      col("c"), col("v"))
    val r = chunked.select(col("id").as("doc_id_b"), col("simhash").as("sb"),
      col("c"), col("v"))
    l.join(r, Seq("c", "v")).filter(col("doc_id_a") < col("doc_id_b"))
      .select(col("doc_id_a"), col("doc_id_b"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): DataFrame =
    pairs(signatures(docs, idCol, textCol), maxHamming)
}
