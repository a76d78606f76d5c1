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

  test("GraftExtensions injects the SQL functions (withExtensions session)") {
    import org.apache.spark.sql.SparkSession
    val orig = spark
    // getOrCreate reuses the active session, so clear the markers to get
    // a fresh session (same SparkContext) with the extensions applied
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[2]")
        .withExtensions(new GraftExtensions).getOrCreate()
      val r = s2.sql(
        """SELECT dot_product_f(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |                     array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
          |       json_payload_has_key('{"payload":{"after":null}}', 'after') AS has,
          |       json_payload_has_key('{"payload":{"x":"\"after\": decoy"}}', 'after') AS decoy
          |""".stripMargin).head()
      assert(r.getDouble(0) == 11.0)
      assert(r.getBoolean(1))
      assert(!r.getBoolean(2))
    } finally {
      SparkSession.setActiveSession(orig)
      SparkSession.setDefaultSession(orig)
    }
  }


  test("registerAll: every engine kernel is reachable from plain SQL") {
    GraftFunctions.registerAll(spark)
    // scalar kernels
    val r = spark.sql(
      """SELECT repetition_stats(array('a','b','a','b','a')) AS rs,
        |       json_payload_has_key('{"payload":{"after":{}}}', 'after') AS has,
        |       json_payload_raw('{"payload":{"after":{"id":7}}}', 'after') AS raw
        |""".stripMargin).head()
    val rs = r.getStruct(0)
    assert(rs.getLong(0) == 5L && rs.getLong(1) == 2L) // nt1=5 nd1=2
    assert(rs.getLong(3) == 2L)                        // "a b" twice
    assert(r.getBoolean(1))
    assert(r.getString(2) == """{"id":7}""")
    // sketch aggregates over xxhash64'd tokens, grouped — a SQL user's
    // dedup/frequency pipeline with no Column-API involvement
    val agg = spark.sql(
      """SELECT CAST(v % 2 AS INT) AS grp,
        |       simhash_agg(xxhash64(CAST(v AS STRING))) AS sh,
        |       countmin_agg(xxhash64(CAST(v AS STRING))) AS cm,
        |       bloom_agg(xxhash64(CAST(v AS STRING))) AS bf
        |FROM (SELECT explode(sequence(1, 100)) AS v)
        |GROUP BY 1""".stripMargin).collect()
    assert(agg.length == 2)
    agg.foreach { row =>
      assert(!row.isNullAt(1))
      assert(row.getSeq[Long](2).nonEmpty && row.getSeq[Long](3).nonEmpty)
    }
    // quantile sketch: build + probe from plain SQL; 1..1000 overflows
    // the registered capacity (400), so the answer is the sketch's —
    // assert the certified rank bound, not exactness
    val med = spark.sql(
      """SELECT quantile_sketch_probe(
        |         quantile_sketch_agg(CAST(v AS DOUBLE)), 0.5) AS p50
        |FROM (SELECT explode(sequence(1, 1000)) AS v)""".stripMargin).head()
    assert(math.abs(med.getDouble(0) - 500.0) <= 20.0,
      s"median within the sketch's rank bound, got $med")
  }

  test("registered SQL functions reject wrong arity and non-literal keys by name") {
    GraftFunctions.registerAll(spark)
    val e1 = intercept[Exception](spark.sql("SELECT json_payload_raw('{}')").head())
    assert(e1.getMessage.contains("json_payload_raw"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("SELECT json_payload_has_key('{}', concat('af','ter'))").head())
    assert(e2.getMessage.contains("string literal") ||
      e2.getMessage.contains("json_payload_has_key"), e2.getMessage)
  }

  test("CountMinAgg: estimates never undercount and are partition-independent") {
    import graft.functions.CountMinAgg
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val words = Seq.tabulate(500)(i => s"w${i % 37}").toDF("token")
    val cm = udaf(CountMinAgg)
    def run(df: org.apache.spark.sql.DataFrame) = {
      val sketch = df.agg(cm(CountMinAgg.lift(col("token"))).as("sketch"))
      df.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(sketch))
        .withColumn("est", CountMinAgg.estimate(col("sketch"), col("token")))
        .select(col("token"), col("cnt"), col("est"))
        .as[(String, Long, Long)].collect().sortBy(_._1)
    }
    val r1 = run(words)
    val r2 = run(words.repartition(7))
    assert(r1.toSeq == r2.toSeq, "sketch must be deterministic under partitioning")
    r1.foreach { case (t, cnt, est) =>
      assert(est >= cnt, s"count-min undercounted $t: est $est < exact $cnt")
      // 37 distinct words in 4096 buckets: collisions are essentially
      // impossible, so the estimate should be exact here
      assert(est == cnt, s"unexpected collision on $t")
    }
  }

  test("TopKAgg equals sorted-take-k per group and is partition-independent") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(2000)((rnd.nextInt(7).toLong,
      math.round(rnd.nextDouble() * 1e4) / 100.0)) // duplicates likely
    val expected = rows.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted(Ordering[Double].reverse).take(3).toSeq).toMap
    def run(parts: Int) = {
      val topk = udaf(new graft.functions.TopKAgg(3))
      rows.toDF("k", "v").repartition(parts)
        .groupBy(col("k")).agg(topk(col("v")).as("vs"))
        .as[(Long, Seq[Double])].collect().toMap
    }
    val r1 = run(1)
    val r32 = run(32)
    assert(r1 == expected, "single-partition top-k must equal sorted take")
    assert(r32 == expected, "top-k must not depend on partitioning")
  }
}
