package graft
import org.apache.spark.sql.functions._
import graft.ops._
object Debug_tmp {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false").config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.shuffle.partitions","4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // session window boundary
    val rows = Seq((1L, new java.sql.Timestamp(0L)), (1L, new java.sql.Timestamp(30*60000L)), (1L, new java.sql.Timestamp(45*60000L))).toDF("user_id","ts")
    rows.groupBy(session_window(col("ts"), "30 minutes"), col("user_id")).agg(count(lit(1))).show(10, false)
    // simhash hamming for exact near-dup pairs
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val exact = Shingles.jaccardPairs(Shingles.tokenShingles(docs, "doc_id", "text", 3), 0.6)
    val sigs = SimHash.signatures(docs, "doc_id", "text")
    val withH = exact.join(sigs.select(col("id").as("doc_id_a"), col("simhash").as("ha")), "doc_id_a")
      .join(sigs.select(col("id").as("doc_id_b"), col("simhash").as("hb")), "doc_id_b")
      .select(col("doc_id_a"), col("doc_id_b"), round(col("jac"),2).as("jac"), bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
    withH.orderBy(col("hamming")).show(30)
    spark.stop()
  }
}
