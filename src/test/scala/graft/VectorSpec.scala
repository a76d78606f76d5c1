package graft

import graft.ops.VectorSearch
import org.apache.spark.sql.functions._

class VectorSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf001)

  test("cosine: self-similarity is 1, orthogonal is 0") {
    val df = Seq(
      (1L, Seq(1f, 0f, 0f)), (2L, Seq(0f, 1f, 0f)), (3L, Seq(2f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val sims = df.as("a").crossJoin(df.as("b"))
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        VectorSearch.cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .as[(Long, Long, Double)].collect().map { case (a, b, c) => (a, b) -> c }.toMap
    assert(math.abs(sims((1L, 3L)) - 1.0) < 1e-12) // parallel
    assert(math.abs(sims((1L, 2L))) < 1e-12)       // orthogonal
    assert(math.abs(sims((1L, 1L)) - 1.0) < 1e-12)
  }

  test("semanticDedup: within-cell near-dups drop (lowest id survives), cross-cell twins both survive") {
    // cell = argmax dim. 1,2: same cell (dim 1 dominant), near-identical
    // -> 2 drops. 3: cosine-similar to 1 but argmax dim 2 -> different
    // cell, survives (the documented cross-boundary recall loss).
    // 4: same cell as 1/2 but orthogonal-ish -> survives.
    val d = Seq(
      (1L, Seq(10f, 1f, 0f)),
      (2L, Seq(10f, 1.1f, 0f)),
      (3L, Seq(9f, 9.5f, 0f)),
      (4L, Seq(1f, 0.5f, -9f))) // argmax = dim 1 (max value 1f)
      .toDF("vec_id", "embedding")
    val out = VectorSearch.semanticDedup(d,
      array_position(col("embedding"), array_max(col("embedding"))), 0.9)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 3L, 4L))
    assert(out.toMap == Map(1L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("knnClassify: a query outside the corpus keeps its prediction (null self-label)") {
    // the advertised use case — classify an UNLABELED item: its vec_id
    // has no corpus row, so the self-label join must not drop it
    val corpus = Seq(
      (1L, Seq(1f, 0f), 7L), (2L, Seq(0.9f, 0.1f), 7L), (3L, Seq(0f, 1f), 9L))
      .toDF("vec_id", "embedding", "label")
    val queries = Seq((100L, Seq(1f, 0.05f))).toDF("vec_id", "embedding")
    val out = VectorSearch.knnClassify(queries, corpus, 2)
      .select("q_vec_id", "pred_label", "votes", "label")
      .collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 100L && out(0).getLong(1) == 7L
      && out(0).getLong(2) == 2L && out(0).isNullAt(3))
  }

  test("knnExact returns k ranked neighbors per query, no self-matches") {
    val res = VectorSearch.knnExact(emb.filter(col("vec_id") < 5), emb, 3)
      .as[(Long, Long, Double, Int)].collect()
    assert(res.length == 15)
    assert(res.forall { case (q, n, _, _) => q != n })
    res.groupBy(_._1).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == Seq(1, 2, 3))
      // descending cosine with rank
      assert(byRank.map(_._3).toSeq == byRank.map(_._3).sorted.reverse.toSeq)
    }
  }

  test("IVF ANN reaches >= 60% of exact top-5") {
    val exact = VectorSearch.knnExact(emb.filter(col("vec_id") < 10), emb, 5)
      .select("q_vec_id", "n_vec_id").as[(Long, Long)].collect().toSet
    val ann = VectorSearch.knnIvf(emb.filter(col("vec_id") < 10), emb, 5)
      .select("q_vec_id", "n_vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect ann).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall $recall")
  }

  test("IVF recall operating curve: recall is probe-monotone and meets per-point SLOs") {
    // the 100 TB operating question is "what recall does a given probe
    // fraction buy" — measured here across nCells × nProbe on the full
    // corpus, with centroids shared per nCells so the candidate set
    // grows monotonically in nProbe (superset ⇒ recall can only rise)
    val queries = emb.filter(col("vec_id") < 50)
    val exact = VectorSearch.knnExact(queries, emb, 5)
      .select("q_vec_id", "n_vec_id").as[(Long, Long)].collect().toSet
    // floors: measured on this fixture minus a safety margin; the point
    // is the SHAPE — nCells=64 on a 500-vector corpus is ~8 vectors per
    // cell, a far harsher partition ratio than the q29 default
    // measured: (16,·)=0.408/0.528/0.656/0.856, (64,·)=0.624/0.696/
    // 0.776/0.852 — note FINER quantization buys more recall per probed
    // cell (64 cells at nProbe=1 probes ~1.6% of the corpus for 0.62
    // recall vs 16 cells' 6% for 0.41): tighter cells, better-targeted
    // candidates. Floors = measured − 0.05 (training is fixed-point
    // deterministic, so the values are stable).
    val floors = Map(
      (16, 1) -> 0.35, (16, 2) -> 0.45, (16, 4) -> 0.60, (16, 8) -> 0.80,
      (64, 1) -> 0.55, (64, 2) -> 0.65, (64, 4) -> 0.70, (64, 8) -> 0.80)
    for (nCells <- Seq(16, 64)) {
      val cents = Some(VectorSearch.trainCentroids(emb, nCells, 3, sampleMod = 1))
      val recalls = Seq(1, 2, 4, 8).map { nProbe =>
        val ann = VectorSearch.knnIvf(queries, emb, 5,
            nCells = nCells, nProbe = nProbe, centroids = cents)
          .select("q_vec_id", "n_vec_id").as[(Long, Long)].collect().toSet
        val r = (exact intersect ann).size.toDouble / exact.size
        info(f"nCells=$nCells nProbe=$nProbe recall=$r%.3f")
        assert(r >= floors((nCells, nProbe)),
          s"recall $r below SLO ${floors((nCells, nProbe))} at ($nCells, $nProbe)")
        r
      }
      assert(recalls == recalls.sorted,
        s"recall must be monotone in nProbe under shared centroids: $recalls")
    }
  }

  test("IVF-PQ: codes reconstruct their own centroid best; ANN reaches >= 60% of exact top-5") {
    // PQ encoder sanity: a vector that IS a codebook centroid must
    // encode to that centroid's index in every subspace
    val cb = VectorSearch.trainPqCodebook(emb)
    val m = 8; val ks = 64; val dsub = 8
    val centroidVec = (0 until 64).map(i => cb((i / dsub) * ks * dsub + (i % dsub) + 0))
    // ^ centroid 0 of each subspace concatenated
    val df = Seq((1L, centroidVec)).toDF("vec_id", "embedding")
      .select(col("vec_id"),
        graft.functions.VecFunctions.pqEncodeF(col("embedding"), cb, m, ks, dsub).as("codes"))
    assert(df.select("codes").as[Seq[Int]].head() == Seq.fill(m)(0))

    val exact = VectorSearch.knnExact(emb.filter(col("vec_id") < 10), emb, 5)
      .select("q_vec_id", "n_vec_id").as[(Long, Long)].collect().toSet
    val pq = VectorSearch.knnIvfPq(emb.filter(col("vec_id") < 10), emb, 5)
      .select("q_vec_id", "n_vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect pq).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF-PQ recall $recall")
  }

  test("PQ codebook training is partition-invariant (fixed-point updates)") {
    val c1 = VectorSearch.trainPqCodebook(emb)
    val c2 = VectorSearch.trainPqCodebook(emb.repartition(7))
    assert(c1.toSeq == c2.toSeq)
  }

  test("Lloyd-trained quantizer: deterministic, no empty cells, assignments move") {
    val c1 = VectorSearch.trainCentroids(emb, 8, 3)
    val c2 = VectorSearch.trainCentroids(emb.repartition(7), 8, 3)
    // fixed-point centroid updates: bitwise identical under any partitioning
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    val sizes = VectorSearch.cellSizes(emb, 8, 3)
    assert(sizes.forall(_ > 0), s"empty cells: ${sizes.mkString(",")}")
    // training actually moves centroids off the first-N init
    val init = VectorSearch.trainCentroids(emb, 8, 0)
    assert(c1.map(_.toSeq).toSeq != init.map(_.toSeq).toSeq)
  }

  test("embedding near-dup pairs are symmetric-free (a < b) and thresholded") {
    val pairs = VectorSearch.nearDupPairsExact(emb, 0.3)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, c) =>
      assert(a < b); assert(c >= 0.3)
    }
  }

  test("banded sign-LSH near-dup reproduces the exact all-pairs result") {
    val exact = VectorSearch.nearDupPairsExact(emb, 0.4)
      .as[(Long, Long, Double)].collect().toSet
    val banded = VectorSearch.nearDupPairsBanded(emb, 0.4)
      .as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty)
    assert(banded == exact,
      s"missed=${(exact diff banded).size} spurious=${(banded diff exact).size}")
  }

  test("banded near-dup plan contains no cross/nested-loop join") {
    val plan = VectorSearch.nearDupPairsBanded(emb, 0.4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("semanticDedup plans the pair generation as a cell EQUIJOIN, never a cartesian") {
    // the cell-scoped join is the operator's scale guarantee — a plan
    // regression to an unkeyed product would be all-pairs in disguise
    val plan = VectorSearch.semanticDedup(emb,
      array_position(col("embedding"), array_max(col("embedding"))), 0.2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("filteredKnnExact: PRE-filter semantics — the true top-k of the matching subset, not a post-filter of the unfiltered top-k") {
    // query sits on cluster A (ids 1-3); allowed set is cluster B
    // (ids 11-13, further away). An unfiltered top-3 is all A, so a
    // post-filter would return ZERO rows; pre-filter must return the
    // full B ranking.
    val corpus = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0.99f, 0.01f)), (3L, Seq(0.98f, 0.02f)),
      (11L, Seq(0f, 1f)), (12L, Seq(0.1f, 0.9f)), (13L, Seq(0.2f, 0.8f)))
      .toDF("vec_id", "embedding")
    val q = Seq((100L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val allowed = Seq(11L, 12L, 13L).toDF("vec_id")
    val unfiltered = VectorSearch.knnExact(q, corpus, 3)
      .select("n_vec_id").as[Long].collect().toSet
    assert(unfiltered == Set(1L, 2L, 3L)) // post-filter would keep nothing
    val filtered = VectorSearch.filteredKnnExact(q, corpus, allowed, 3)
      .orderBy("rnk").select("n_vec_id").as[Long].collect().toSeq
    assert(filtered == Seq(13L, 12L, 11L)) // B ranked by closeness to (1,0)
  }

  test("filteredKnnExact equals knnExact over the manually filtered corpus") {
    val allowed = emb.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id"))
    val q = emb.filter(col("vec_id") < 5)
    val viaOp = VectorSearch.filteredKnnExact(q, emb, allowed, 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    val manual = VectorSearch.knnExact(q,
      emb.filter(col("vec_id") % 2 === 0), 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(viaOp == manual)
  }

  test("mmrRerank suppresses a near-duplicate the pure top-k would keep") {
    // ids 10/11 nearly identical (both very relevant to the query —
    // which deliberately matches NO candidate exactly, else rel(c) ==
    // sim(c, first-pick) and every round-2 score degenerates to 0),
    // 12 moderately relevant but diverse, 13 diverse filler.
    // Pure top-3 = 10,11,12; MMR at λ=1/2 must pick 10, skip the
    // near-dup 11, take 12 then 13.
    val corpus = Seq(
      (10L, Seq(0.98f, 0.199f, 0f)), (11L, Seq(0.97f, 0.243f, 0f)),
      (12L, Seq(0.9f, -0.436f, 0f)), (13L, Seq(0.5f, 0f, 0.866f)))
      .toDF("vec_id", "embedding")
    val q = Seq((100L, Seq(1f, 0f, 0f))).toDF("vec_id", "embedding")
    val top3 = VectorSearch.knnExact(q, corpus, 3)
      .orderBy("rnk").select("n_vec_id").as[Long].collect().toSeq
    assert(top3 == Seq(10L, 11L, 12L))
    val mmr = VectorSearch.mmrRerank(q, corpus, candK = 4, k = 3)
      .select("q_vec_id", "mmr_topk").as[(Long, String)].collect()
    assert(mmr.toSeq == Seq((100L, "10,12,13")))
  }

  test("mmrRerank at λ=1 (lambdaNum=lambdaDen) degenerates to pure relevance order") {
    val corpus = Seq(
      (10L, Seq(1f, 0f)), (11L, Seq(0.99f, 0.141f)), (12L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val q = Seq((100L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val mmr = VectorSearch.mmrRerank(q, corpus, candK = 3, k = 3,
      lambdaNum = 1L, lambdaDen = 1L)
      .select("mmr_topk").as[String].collect()
    assert(mmr.toSeq == Seq("10,11,12"))
  }

  test("rankingEval: perfect prediction scores 1.0 across the board; a disjoint one scores 0 without dropping the query") {
    val truth = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1), (2L, 21L, 2))
      .toDF("q_vec_id", "n_vec_id", "rnk")
    val perfect = truth
    val out = VectorSearch.rankingEval(perfect, truth, 2)
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 2L, 1.0, 1.0, 1.0)))
    assert(out(2L) == ((2L, 2L, 1.0, 1.0, 1.0)))
    // query 2's prediction finds nothing — it must still score, at zero
    val miss = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 98L, 1), (2L, 99L, 2))
      .toDF("q_vec_id", "n_vec_id", "rnk")
    val out2 = VectorSearch.rankingEval(miss, truth, 2)
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out2(2L) == ((2L, 0L, 0.0, 0.0, 0.0)))
    assert(out2(1L)._5 == 1.0)
  }

  test("rankingEval: a reversed top-2 keeps recall 1 but discounts ndcg below 1 and mrr stays 1") {
    // truth top-2 found but in swapped order: rank-1 item at rank 2.
    // With binary gains both orders have the same DCG over the same
    // hit SET — so use a prediction hitting only the deeper slot:
    // pred rank 1 misses, rank 2 hits → mrr = 1/2, dcg = 1/ln(3).
    val truth = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("q_vec_id", "n_vec_id", "rnk")
    val pred = Seq((1L, 99L, 1), (1L, 10L, 2)).toDF("q_vec_id", "n_vec_id", "rnk")
    val r = VectorSearch.rankingEval(pred, truth, 2)
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(r._2 == 1L && r._3 == 0.5 && r._4 == 0.5)
    val idcg = math.floor(1e9 / math.log(2) + 0.5) + math.floor(1e9 / math.log(3) + 0.5)
    val want = math.floor(1e9 / math.log(3) + 0.5) / idcg
    assert(math.abs(r._5 - want) < 1e-12, s"ndcg ${r._5} want $want")
  }

  test("hardNegatives: only different-label neighbors, ranked by closeness; same-label twins never appear") {
    // anchor 1 (label 7): its closest row 2 SHARES the label and must
    // not appear; the hardest negative is 3 (label 9, nearly parallel),
    // then 4 (label 9, orthogonal-ish)
    val corpus = Seq(
      (1L, Seq(1f, 0f), 7), (2L, Seq(0.999f, 0.045f), 7),
      (3L, Seq(0.98f, 0.199f), 9), (4L, Seq(0f, 1f), 9))
      .toDF("vec_id", "embedding", "label")
    val out = VectorSearch.hardNegatives(
      corpus.filter(col("vec_id") === 1), corpus, 2)
      .orderBy("rnk")
      .select("a_vec_id", "n_vec_id", "n_label").as[(Long, Long, Long)]
      .collect().toSeq
    assert(out == Seq((1L, 3L, 9L), (1L, 4L, 9L)))
  }

  test("filteredKnnIvfFromPostings: only allowed ids, k rows per query, recall >= 0.6 vs exact filtered at 16 cells x 4 probes") {
    val cents = VectorSearch.trainCentroids(emb, 16, 3, sampleMod = 0)
    val postings = emb.select(col("vec_id"),
      VectorSearch.nearestCell(col("embedding"), cents).as("cell"),
      col("embedding"))
    val allowed = emb.filter(col("vec_id") % 2 === 0).select(col("vec_id"))
    val q = emb.filter(col("vec_id") < 10)
    val ivf = VectorSearch.filteredKnnIvfFromPostings(q, postings, allowed,
      5, cents, nProbe = 4)
      .select("q_vec_id", "n_vec_id").as[(Long, Long)].collect()
    assert(ivf.forall(_._2 % 2 == 0), "a filtered-out id was served")
    assert(ivf.groupBy(_._1).forall(_._2.length == 5))
    val exact = VectorSearch.filteredKnnExact(q, emb, allowed, 5)
      .select("q_vec_id", "n_vec_id").as[(Long, Long)].collect().toSet
    val recall = ivf.count(exact.contains).toDouble / exact.size
    assert(recall >= 0.6, s"filtered recall $recall below the q145 floor")
  }
}
