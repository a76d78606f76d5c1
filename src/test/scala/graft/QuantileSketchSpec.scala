package graft

import graft.functions.QuantileSketchAgg

/** KLL-style mergeable quantile sketch: exactness below capacity,
  * certified rank error under forced compactions, partition-layout
  * robustness of the bound, and weight conservation.
  */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(values: Seq[Double], capacity: Int,
      partitions: Int): Array[Double] =
    values.toDF("value").repartition(partitions).as[Double]
      .select(new QuantileSketchAgg(capacity).toColumn).head()

  test("below capacity the sketch is exact") {
    val vs = (1 to 100).map(_.toDouble)
    val sk = sketchOf(scala.util.Random.shuffle(vs), capacity = 128, partitions = 3)
    assert(QuantileSketchAgg.weight(sk) == 100)
    // merge of sub-capacity partials may still compact; tolerate the
    // certified error, but sub-capacity single-partition is exact
    val sk1 = sketchOf(vs, capacity = 128, partitions = 1)
    assert(QuantileSketchAgg.quantile(sk1, 0.5) == 50.0)
    assert(QuantileSketchAgg.quantile(sk1, 0.01) == 1.0)
    assert(QuantileSketchAgg.quantile(sk1, 1.0) == 100.0)
  }

  test("certified rank error under forced compactions, any partitioning") {
    val n = 50000
    val vs = scala.util.Random.shuffle((1 to n).map(_.toDouble))
    for (parts <- Seq(1, 7, 32)) {
      val sk = sketchOf(vs, capacity = 64, partitions = parts)
      assert(QuantileSketchAgg.weight(sk) == n, s"weight conserved at $parts parts")
      for (p <- Seq(0.1, 0.5, 0.9, 0.99)) {
        val est = QuantileSketchAgg.quantile(sk, p)
        val rank = est / n // values are 1..n, so exact rank(est) = est/n
        assert(math.abs(rank - p) <= 0.04,
          s"p=$p parts=$parts: rank(${est}) = $rank drifted past the bound")
      }
    }
  }

  test("sketch size stays logarithmic, not linear") {
    val sk = sketchOf((1 to 50000).map(_.toDouble), capacity = 64, partitions = 8)
    assert(sk.length < 64 * 20,
      s"packed size ${sk.length} should be O(capacity x levels), not O(n)")
  }
}
