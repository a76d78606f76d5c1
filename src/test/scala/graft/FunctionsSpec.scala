package graft

import graft.functions.VecFunctions

/** SQL-surface registration of the custom kernel. */
class FunctionsSpec extends SparkSpec {

  test("dot_product_f is callable from SQL after registration") {
    VecFunctions.register(spark)
    Tables.embeddings(spark, sf001).limit(10).createOrReplaceTempView("emb_v")
    val rows = spark.sql(
      """SELECT a.vec_id, dot_product_f(a.embedding, a.embedding) AS sq
        |FROM emb_v a""".stripMargin).collect()
    assert(rows.length == 10)
    rows.foreach(r => assert(r.getDouble(1) > 0.0))
  }
}
