package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.extensions.Similarity

/** The cost-based ANN front door (Similarity.topk): the pure dispatch
  * rule picks brute below the crossover and IVF / IVF-PQ above it, the
  * routed paths are result-identical to the explicit calls with the same
  * derived geometry, and the chosen plan is observable via session conf.
  */
class AnnDispatchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def embs = Graft.table(spark, TestSpark.sfDir, "embeddings")
  private def queries = embs.where(col("vec_id") < 10)

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long)] =
    df.select(col("q_id"), col("rk").cast("int"), col("nbr_id"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSet

  test("dispatch rule: brute below the crossover, ivf then ivfpq above, exact pins brute") {
    // below bruteMax → brute regardless of target
    assert(Similarity.annPlan(50000, 64, 0.9, 100000, 1000000) == "brute")
    // above bruteMax, below ivfPqMin → ivf
    assert(Similarity.annPlan(500000, 64, 0.9, 100000, 1000000) == "ivf")
    // beyond ivfPqMin → ivfpq
    assert(Similarity.annPlan(50000000, 64, 0.9, 100000, 1000000) == "ivfpq")
    // recallTarget = 1.0 demands exact: brute even at 50M vectors
    assert(Similarity.annPlan(50000000, 64, 1.0, 100000, 1000000) == "brute")
    // a dimension PQ cannot subdivide falls back to ivf at ivfpq scale
    assert(Similarity.annPlan(50000000, 63, 0.9, 100000, 1000000) == "ivf")
  }

  test("ivf geometry: ~sqrt(n) cells clamped, probe fraction follows the recall target") {
    assert(Similarity.ivfParams(100, 0.9) == ((16, 4))) // floor clamp
    val (c1m, p1m) = Similarity.ivfParams(1000000, 0.9)
    assert(c1m == 1000 && p1m == 250)
    assert(Similarity.ivfParams(1000000, 0.95)._2 == 375)
    assert(Similarity.ivfParams(1000000, 0.5)._2 == 125)
    assert(Similarity.ivfParams(100000000L, 0.9)._1 == 4096) // ceiling clamp
  }

  test("default route on the fixture corpus is brute, parity exact, choice recorded") {
    val auto = rows(Similarity.topk(embs, queries, k = 5))
    assert(spark.conf.get(Similarity.ChoiceKey) == "brute")
    assert(auto == rows(Similarity.topkBrute(embs, queries, k = 5)))
  }

  test("forced IVF route (bruteMax below corpus) equals the explicit topkIvf call") {
    val n = embs.count()
    spark.conf.set(Similarity.BruteMaxKey, "10")
    try {
      val auto = rows(Similarity.topk(embs, queries, k = 5))
      assert(spark.conf.get(Similarity.ChoiceKey) == "ivf")
      val (nCells, nprobe) = Similarity.ivfParams(n, 0.9)
      val explicit = rows(
        Similarity.topkIvf(Similarity.ivfIndex(embs, nCells), queries, k = 5, nCells = nCells, nprobe = nprobe)
      )
      assert(auto == explicit)
      // recall floor vs exact on the fixture: the dispatch may not ship a
      // configuration that loses more than the documented 10%
      val exact = rows(Similarity.topkBrute(embs, queries, k = 5))
      val recall = auto.map(t => (t._1, t._3)).intersect(exact.map(t => (t._1, t._3))).size.toDouble /
        exact.size
      assert(recall >= 0.9, s"auto-dispatched IVF recall $recall under the 0.9 floor")
    } finally spark.conf.unset(Similarity.BruteMaxKey)
  }

  test("huge query sets on the IVF route go chunked-broadcast by default, co-partitioned when pinned") {
    val n = embs.count()
    spark.conf.set(Similarity.BruteMaxKey, "10")
    spark.conf.set(Similarity.BroadcastQueriesMaxKey, "5") // 10 queries > 5
    try {
      val (nCells, nprobe) = Similarity.ivfParams(n, 0.9)
      // default: the chunked-broadcast middle route (round 9)
      val auto = rows(Similarity.topk(embs, queries, k = 5))
      assert(spark.conf.get(Similarity.ChoiceKey) == "ivf_chunked")
      val explicitChunked = rows(
        Similarity.topkIvfChunked(
          Similarity.ivfIndex(embs, nCells), queries, k = 5, nCells = nCells, nprobe = nprobe, chunkMax = 5)
      )
      assert(auto == explicitChunked)
      // pinned off: the lazy co-partitioned shuffle prober
      spark.conf.set(Similarity.ChunkedBroadcastKey, "false")
      val autoLarge = rows(Similarity.topk(embs, queries, k = 5))
      assert(spark.conf.get(Similarity.ChoiceKey) == "ivf_large")
      val explicit = rows(
        Similarity.topkIvfLarge(Similarity.ivfIndex(embs, nCells), queries, k = 5, nCells = nCells, nprobe = nprobe)
      )
      assert(autoLarge == explicit)
    } finally {
      spark.conf.unset(Similarity.BruteMaxKey)
      spark.conf.unset(Similarity.BroadcastQueriesMaxKey)
      spark.conf.unset(Similarity.ChunkedBroadcastKey)
    }
  }

  test("chunked-broadcast prober equals the single-broadcast prober, any chunking") {
    // round 9: the middle route — ⌈n/chunkMax⌉ sequential broadcast
    // chunks must reproduce topkIvf exactly (chunking partitions q_ids;
    // per-query results are independent). chunkMax=3 forces 4 chunks on
    // the 10-query fixture; chunkMax ≥ n must collapse to the plain path.
    val n = embs.count()
    val (nCells, nprobe) = Similarity.ivfParams(n, 0.9)
    val idx = Similarity.ivfIndex(embs, nCells)
    val plain = rows(Similarity.topkIvf(idx, queries, k = 5, nCells = nCells, nprobe = nprobe))
    val chunked = rows(Similarity.topkIvfChunked(idx, queries, k = 5, nCells = nCells, nprobe = nprobe, chunkMax = 3))
    assert(chunked == plain)
    val collapsed = rows(Similarity.topkIvfChunked(idx, queries, k = 5, nCells = nCells, nprobe = nprobe, chunkMax = 1000))
    assert(collapsed == plain)
  }

  test("forced IVF-PQ route (both ceilings below corpus) equals the explicit topkIvfPq call") {
    val n = embs.count()
    spark.conf.set(Similarity.BruteMaxKey, "10")
    spark.conf.set(Similarity.IvfPqMinKey, "20")
    try {
      val auto = rows(Similarity.topk(embs, queries, k = 5))
      assert(spark.conf.get(Similarity.ChoiceKey) == "ivfpq")
      val (nCells, nprobe) = Similarity.ivfParams(n, 0.9)
      val explicit = rows(
        Similarity.topkIvfPq(embs, queries, k = 5, nCells = nCells, nprobe = nprobe, m = 16, dim = 64, kC = 32, oversample = 8)
      )
      assert(auto == explicit)
    } finally {
      spark.conf.unset(Similarity.BruteMaxKey)
      spark.conf.unset(Similarity.IvfPqMinKey)
    }
  }

  test("auto=false pins brute even above every ceiling") {
    spark.conf.set(Similarity.AutoKey, "false")
    spark.conf.set(Similarity.BruteMaxKey, "10")
    try {
      val pinned = rows(Similarity.topk(embs, queries, k = 5))
      assert(spark.conf.get(Similarity.ChoiceKey) == "brute(pinned)")
      assert(pinned == rows(Similarity.topkBrute(embs, queries, k = 5)))
    } finally {
      spark.conf.unset(Similarity.AutoKey)
      spark.conf.unset(Similarity.BruteMaxKey)
    }
  }
}
