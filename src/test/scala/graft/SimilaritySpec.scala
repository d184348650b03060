package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val emb = Tables.embeddings(spark, TestSpark.sfDir).cache()

  test("topK returns exactly k ranked neighbors per query, no self-matches") {
    val out = Similarity.topK(emb, emb.filter($"vec_id" < 3), k = 5).cache()
    assert(out.count() == 15)
    val byQuery = out.groupBy("query_id").agg(count(lit(1)).as("n"),
      max("rank").as("maxr")).collect()
    byQuery.foreach { r =>
      assert(r.getLong(1) == 5 && r.getLong(2) == 5)
    }
    assert(out.filter($"query_id" === $"neighbor_id").count() == 0)
  }

  test("topK rank 1 is the true nearest neighbor (exact check on one query)") {
    val q = emb.filter($"vec_id" === 0)
    val got = Similarity.topK(emb, q, k = 1)
      .select("neighbor_id").as[Long].head()
    val want = emb.as("a").join(q.as("b"), $"a.vec_id" =!= 0)
      .select($"a.vec_id",
        Dedup.cosine($"a.embedding".cast("array<double>"),
          $"b.embedding".cast("array<double>")).as("c"))
      .orderBy($"c".desc, $"a.vec_id").select("vec_id").as[Long].head()
    assert(got == want)
  }

  test("annTopK finds identical-vector clones as rank-1 with certainty") {
    val clones = emb.filter($"vec_id" < 5)
      .select(($"vec_id" + 10000).as("vec_id"), $"embedding", $"label")
    val corpus = emb.unionAll(clones)
    val out = Similarity.annTopK(corpus, emb.filter($"vec_id" < 5), k = 3)
    val rank1 = out.filter($"rank" === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    (0L until 5L).foreach { q =>
      assert(rank1(q) == q + 10000, s"query $q rank-1 should be its clone")
    }
  }

  test("ivfTopK finds identical-vector clones as rank-1 (same cell, distance 0)") {
    val clones = emb.filter($"vec_id" < 5)
      .select(($"vec_id" + 10000).as("vec_id"), $"embedding", $"label")
    val corpus = emb.unionAll(clones)
    val out = Similarity.ivfTopK(corpus, emb.filter($"vec_id" < 5), k = 3)
    val rank1 = out.filter($"rank" === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    (0L until 5L).foreach { q =>
      assert(rank1(q) == q + 10000, s"query $q rank-1 should be its clone")
    }
  }

  test("ivfTopK with full probing equals the exhaustive topK exactly") {
    val queries = emb.filter($"vec_id" < 3)
    val exact = Similarity.topK(emb, queries, k = 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, queries, k = 5, nlist = 16, nprobe = 16)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(ivf == exact, "probing every cell must recover the exact ranking")
    // partial probing still yields full result sets (ranks are contiguous)
    val partial = Similarity.ivfTopK(emb, queries, k = 5, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(partial.nonEmpty)
  }

  test("seeded IVF with full probing equals the exhaustive topK exactly") {
    val q = emb.filter($"vec_id" < 3)
    val exact = Similarity.topK(emb, q, k = 8).collect().toSet
    val full = Similarity.ivfTopKSeeded(emb, q, k = 8,
      nlist = 8, nprobe = 8).collect().toSet
    assert(full == exact,
      "probing every seeded cell must recover the exact ranking")
    // partial probe: a subset of the exact candidates, ranks contiguous
    val part = Similarity.ivfTopKSeeded(emb, q, k = 8, nlist = 8, nprobe = 2)
    val perQ = part.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rank").as("maxr")).collect()
    perQ.foreach(r => assert(r.getLong(1) == r.getLong(2),
      "ranks must be 1..n contiguous"))
    assert(part.filter($"query_id" === $"neighbor_id").count() == 0)
  }

  test("hybrid search fuses lexical and semantic ranks, agreement wins") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val out = Similarity.hybridSearch(docs, emb,
      Seq("spark", "join", "window"), queryVecId = 0L).cache()
    assert(out.count() == 10)
    val ranks = out.select("rank").as[Long].collect().sorted.toSeq
    assert(ranks == (1L to 10L), "fused ranks contiguous from 1")
    // every fused hit came from one or both of the two rankers
    val nl = out.select("n_lists").as[Long].collect().toSet
    assert(nl.subsetOf(Set(1L, 2L)))
    // RRF monotonicity: scores non-increasing in fused rank
    val scores = out.orderBy($"rank").select("rrf_e9").as[Long].collect()
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // a doc on BOTH lists outranks one with a single equal-rank entry:
    // planted check via the score formula itself
    val both = out.filter($"n_lists" === 2).select("rrf_e9").as[Long].collect()
    val single = out.filter($"n_lists" === 1).select("rrf_e9").as[Long].collect()
    if (both.nonEmpty && single.nonEmpty)
      assert(both.max >= single.max,
        "two-list agreement cannot score below every single-list hit")
  }

  test("idCol/vecCol input parameters are honored on renamed-column frames") {
    val renamed = emb.select($"vec_id".as("id"), $"embedding".as("vec"))
    val q = emb.filter($"vec_id" < 3)
    val qr = renamed.filter($"id" < 3)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Long)].collect().toSet
    assert(rows(Similarity.topK(renamed, qr, k = 5, idCol = "id", vecCol = "vec"))
      == rows(Similarity.topK(emb, q, k = 5)))
    assert(rows(Similarity.annTopK(renamed, qr, k = 5, idCol = "id", vecCol = "vec"))
      == rows(Similarity.annTopK(emb, q, k = 5)))
    assert(rows(Similarity.ivfTopK(renamed, qr, k = 5, nlist = 16, nprobe = 16,
        idCol = "id", vecCol = "vec"))
      == rows(Similarity.ivfTopK(emb, q, k = 5, nlist = 16, nprobe = 16)))
  }

  test("annTopK is a subset of the exact ranking's candidate pool semantics") {
    val out = Similarity.annTopK(emb, emb.filter($"vec_id" < 3), k = 10)
    // ranks contiguous from 1 per query; neighbor ids valid
    out.groupBy("query_id").agg(collect_list("rank").as("rs")).collect()
      .foreach { r =>
        val rs = r.getSeq[Long](1).sorted
        assert(rs == (1L to rs.length))
      }
  }

  test("centroid classifier separates well-separated clusters perfectly") {
    // two axis-aligned clusters with small within-class jitter
    val data = Seq(
      (1L, Array(1.0f, 0.1f, 0f, 0f), 0), (2L, Array(0.9f, 0f, 0.1f, 0f), 0),
      (3L, Array(1.1f, 0f, 0f, 0.1f), 0),
      (4L, Array(0f, 1.0f, 0.1f, 0f), 1), (5L, Array(0.1f, 0.9f, 0f, 0f), 1),
      (6L, Array(0f, 1.1f, 0f, 0.1f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.centroidClassify(data, dim = 4)
      .orderBy("label", "pred")
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((0L, 0L, 3L), (1L, 1L, 3L)), s"got $r")
  }

  test("centroid confusion matrix accounts for every vector exactly once") {
    val e = Tables.embeddings(spark, TestSpark.sfDir)
    val total = Similarity.centroidClassify(e)
      .agg(sum($"n")).as[Long].head()
    assert(total == e.count(), "every vector gets exactly one prediction")
  }

  test("knnGraph caps per-node degree at k, no self-edges, ranks contiguous") {
    val g = Similarity.knnGraph(emb, k = 5, maxBucket = Some(64)).cache()
    assert(g.filter($"query_id" === $"neighbor_id").count() == 0)
    val per = g.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rank").as("maxr")).collect()
    per.foreach { r =>
      assert(r.getLong(1) <= 5 && r.getLong(1) == r.getLong(2),
        s"degree must be <= k and ranks 1..n: $r")
    }
    // no duplicate directed edges survive the multi-table candidacy
    assert(g.count() == g.select("query_id", "neighbor_id").distinct().count())
  }

  test("knnGraph finds identical-vector clones as rank-1") {
    val clones = emb.filter($"vec_id" < 5)
      .select(($"vec_id" + 10000).as("vec_id"), $"embedding", $"label")
    val g = Similarity.knnGraph(emb.unionAll(clones), k = 3)
    val rank1 = g.filter($"query_id" >= 10000 && $"rank" === 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    (0L until 5L).foreach { i =>
      assert(rank1(i + 10000) == i, "a clone's nearest neighbor is its twin")
    }
  }

  test("pageRank concentrates mass on the connected cluster, not the outlier") {
    // five identical vectors (a 5-clique in the kNN graph) + one orthogonal
    // outlier: the clique members receive five in-links each, the outlier
    // only what the clique's leftover k-slots donate — clique must outrank
    val base = Array.fill(8)(0.5f)
    val data = ((1L to 5L).map(i => (i, base, 0)) :+
      (9L, Array(-1f, 1f, -1f, 1f, -1f, 1f, -1f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.pageRank(data, k = 3, maxBucket = None)
      .collect().map(x => (x.getLong(1), x.getLong(2))).toMap
    assert(r.size == 6)
    assert(r.values.forall(_ > 0), "ranks stay positive")
    // with k=3 and the neighbor-id tie-break, in-links flow to 1..4 only;
    // node 5 and the outlier both sit at the dangling base rank
    val linked = (1L to 4L).map(r).min
    assert(linked > r(9L),
      s"in-linked clique members ${linked} must outrank outlier ${r(9L)}")
    assert(r(5L) == r(9L), "no in-links -> base rank for both")
    val again = Similarity.pageRank(data, k = 3, maxBucket = None)
      .collect().map(x => (x.getLong(1), x.getLong(2))).toMap
    assert(again == r, "integer iteration is bit-deterministic")
  }

  test("mutualKnn pairs are reciprocal edges of the directed graph") {
    val g = Similarity.knnGraph(emb, k = 5, maxBucket = Some(64)).cache()
    val m = Similarity.mutualKnn(emb, k = 5, maxBucket = Some(64)).cache()
    val edges = g.select($"query_id", $"neighbor_id")
    // every mutual pair exists in BOTH directions in the directed graph
    val fwd = m.join(edges,
      m("id_a") === edges("query_id") && m("id_b") === edges("neighbor_id"))
    val rev = m.join(edges,
      m("id_b") === edges("query_id") && m("id_a") === edges("neighbor_id"))
    assert(fwd.count() == m.count() && rev.count() == m.count())
    val bad = m.filter($"id_a" >= $"id_b" ||
      $"rank_sum" < 2 || $"rank_sum" > 10).count()
    assert(bad == 0, "pairs canonical a<b with rank_sum in [2, 2k]")
  }

  test("triangleStats: a planted 3-clique yields one triangle and coefficient 1") {
    // three identical vectors form a mutual clique; a far-away singleton
    // pair contributes edges but no triangle
    val a = Array.fill(64)(1.0f); val b = Array.fill(64)(-1.0f)
    val data = Seq(
      (1L, a, 0), (2L, a, 0), (3L, a, 0),
      (8L, b, 1), (9L, b, 1)
    ).toDF("vec_id", "embedding", "label")
    val t = Similarity.triangleStats(data, k = 3, maxBucket = None).cache()
    val byId = t.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    Seq(1L, 2L, 3L).foreach { id =>
      assert(byId(id) == ((2L, 1L, 1000000000L)),
        s"clique member $id: degree 2, 1 triangle, coefficient 1.0")
    }
    Seq(8L, 9L).foreach { id =>
      assert(byId(id) == ((1L, 0L, 0L)),
        s"pair member $id: degree 1, no triangles, coefficient 0")
    }
  }

  test("triangleStats counts each triangle once per participant") {
    val t = Similarity.triangleStats(emb, k = 5, maxBucket = Some(64)).cache()
    // total participation is divisible by 3 (each triangle has 3 corners)
    val total = t.agg(sum($"n_triangles")).head().getLong(0)
    assert(total % 3 == 0, s"participation $total must be 3x triangle count")
    // coefficient bounded in [0, NANO]; triangles need degree >= 2
    assert(t.filter($"clustering_nano" < 0 ||
      $"clustering_nano" > 1000000000L).count() == 0)
    assert(t.filter($"degree" < 2 && $"n_triangles" > 0).count() == 0)
  }

  test("hardNegatives returns only cross-label neighbors, ranked contiguously") {
    val hn = Similarity.hardNegatives(emb, k = 5, maxBucket = Some(64)).cache()
    val labels = emb.select($"vec_id", $"label".cast("long").as("l"))
    val joined = hn
      .join(labels.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("l", "ql"), Seq("query_id"))
      .join(labels.withColumnRenamed("vec_id", "neighbor_id")
        .withColumnRenamed("l", "nl"), Seq("neighbor_id"))
    assert(joined.filter($"ql" === $"nl").count() == 0,
      "every mined negative must carry a different label than its anchor")
    assert(joined.filter($"neighbor_label" =!= $"nl").count() == 0,
      "reported neighbor_label matches the corpus label")
    val ranks = hn.groupBy($"query_id")
      .agg(count(lit(1)).as("n"), max($"rank").as("maxr"))
    assert(ranks.filter($"n" =!= $"maxr").count() == 0,
      "ranks are 1..n per anchor with no gaps")
    assert(hn.filter($"rank" > 5).count() == 0)
  }

  test("rrfFusion: agreement between rankers dominates the fused order") {
    val q = emb.filter($"vec_id" < 5)
    val fused = Similarity.rrfFusion(emb, q, k = 10).cache()
    assert(fused.groupBy($"query_id").count()
      .filter($"count" =!= 10).count() == 0, "10 fused results per query")
    val exact = Similarity.topK(emb, q, k = 10)
    val both = fused.filter($"n_lists" === 2).count()
    assert(both > 0, "the two rankers agree on some neighbors")
    // integer scores: every rrf_nano is a sum of 1..2 terms of 1e9/(60+r)
    val legal = (1 to 10).map(r => 1000000000L / (60 + r))
    val sums = legal.toSet ++
      (for (a <- legal; b <- legal) yield a + b)
    fused.collect().foreach { r =>
      assert(sums.contains(r.getLong(2)),
        s"rrf_nano ${r.getLong(2)} must be a legal term sum")
    }
    assert(exact.count() == 50)
  }

  test("knnClassify confusion matrix covers exactly the vectors with neighbors") {
    val m = Similarity.knnClassify(emb, k = 5, maxBucket = Some(64)).cache()
    val classified = m.agg(org.apache.spark.sql.functions.sum($"n"))
      .head().getLong(0)
    val withNeighbors = Similarity.knnGraph(emb, k = 5, maxBucket = Some(64))
      .select($"query_id").distinct().count()
    assert(classified == withNeighbors,
      "one prediction per vector that has at least one surviving neighbor")
    // labels and preds both come from the fixture's label domain
    val labels = emb.select($"label".cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    m.collect().foreach { r =>
      assert(labels.contains(r.getLong(0)) && labels.contains(r.getLong(1)))
    }
  }
}
