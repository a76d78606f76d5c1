package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (BASELINE.md protocol): per-query wall-clock, median
  * of 3 runs after 1 warm-up, single local session, UTC, AQE on.
  * Prints ONE JSON line: {"metric","value","unit","queries","sf"}.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // noop-format write forces FULL row production (every projected
    // column materialized); under .count() Catalyst prunes unused
    // projections, so pure-projection queries measured scan+count only.
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val results: Seq[(String, Double)] = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        try {
          timeOnce(fn) // warm-up: file listing, codegen, broadcast build
          val runs = Seq.fill(3)(timeOnce(fn)).sorted
          name -> runs(1) // median
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            name -> -1.0
        }
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
