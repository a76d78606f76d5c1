package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (BASELINE.md protocol): per-query wall-clock, median
  * of 3 runs after 1 warm-up, single local session, UTC, AQE on.
  * Prints ONE JSON line: {"metric","value","unit","queries","sf",
  * "runs","loadavg"}.
  *
  * `runs` carries every per-query measurement (sorted, the median is
  * `queries[name]`) and `loadavg` the 1/5/15-minute system load at
  * start and end — two rounds running, the driver's artifact was
  * contention-skewed and carried no evidence to show it; the spread and
  * the load numbers make a contended run self-evident (a wide run
  * spread or a start load far above the core count means the medians
  * measure the box, not the code).
  */
object Bench {
  private def loadavg(): String =
    try {
      val parts = scala.io.Source.fromFile("/proc/loadavg").mkString
        .trim.split(" ").take(3)
      parts.mkString("[", ",", "]")
    } catch { case _: Exception => "[]" }

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

    val loadStart = loadavg()
    val results: Seq[(String, Seq[Double])] = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        try {
          timeOnce(fn) // warm-up: file listing, codegen, broadcast build
          name -> Seq.fill(3)(timeOnce(fn)).sorted
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            name -> Seq(-1.0)
        }
    }
    val loadEnd = loadavg()
    val qs = results.map { case (k, rs) => "\"" + k + f"\":${rs(rs.size / 2)}%.3f" }
      .mkString("{", ",", "}")
    val spreads = results.map { case (k, rs) =>
      "\"" + k + "\":" + rs.map(r => f"$r%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.map { case (_, rs) => rs(rs.size / 2) }.filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$spreads,"loadavg":{"start":$loadStart,"end":$loadEnd}}""")
    spark.stop()
  }
}
