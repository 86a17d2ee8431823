package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.extensions.{Dedup, Similarity}

/** Cross-validation of the dedup/similarity implementations against each
  * other (the brute-force DuckDB oracle DNFs beyond sf0.01 — see
  * BASELINE.md — so exactness at larger scale is asserted engine-side). */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs = Graft.table(spark, TestSpark.sfDir, "documents")

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("MinHash-LSH finds exactly the exact-Jaccard pairs at threshold 0.5") {
    val exact = pairSet(Dedup.jaccardPairs(docs, 0.5))
    val lsh = pairSet(Dedup.minhashLshPairs(docs, 0.5))
    assert(lsh == exact, s"missing=${exact -- lsh} spurious=${lsh -- exact}")
    assert(exact.nonEmpty, "fixture has no near-dup pairs; test is vacuous")
  }

  test("lshCandidates is the unverified superset: covers every exact pair, no self/dup rows") {
    // round 15: the candidate stage is exposed separately (ScalePath runs
    // it alone at factor 100 where verified emission exceeds one box) —
    // it must cover the exact pair set (candidate recall on this fixture
    // is 1, same property the verified-equality test above leans on) and
    // emit each candidate once, a < b
    val cand = Dedup.lshCandidates(docs).collect().map(r => (r.getLong(0), r.getLong(1)))
    val candSet = cand.toSet
    assert(cand.length == candSet.size, "duplicate candidate rows")
    assert(candSet.forall { case (a, b) => a < b })
    val exact = pairSet(Dedup.jaccardPairs(docs, 0.5))
    assert(exact.subsetOf(candSet), s"candidates miss exact pairs: ${exact -- candSet}")
  }

  test("incremental LSH against the corpus equals full-pairs restricted to the split") {
    // ground truth: every exact-jaccard pair with one side in the batch,
    // oriented (corpus, batch)
    val batchIds = docs.where(col("doc_id") % 10 === 7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val full = pairSet(Dedup.jaccardPairs(docs, 0.5))
    val expected = full.collect {
      case (a, b) if batchIds(b) && !batchIds(a) => (a, b)
      case (a, b) if batchIds(a) && !batchIds(b) => (b, a)
    }
    val incr = pairSet(
      Dedup.minhashLshPairsAgainst(
        docs.where(col("doc_id") % 10 =!= 7),
        docs.where(col("doc_id") % 10 === 7),
        0.5
      )
    )
    assert(incr == expected, s"missing=${expected -- incr} spurious=${incr -- expected}")
    assert(expected.nonEmpty, "no cross-split near-dup pairs; test is vacuous")
  }

  test("mixture weights: binding source keeps 1.0, mixture matches target") {
    import graft.extensions.{Mixture, TextOps}
    val d = docs.select(col("source"), TextOps.nTokens(col("text")).as("nt"))
    val target =
      (regexp_extract(col("source"), "([0-9]+)$", 1).cast("long") + 1L).cast("double") / 210.0
    val w = Mixture.mixtureWeights(d, col("nt"), target).collect()
    val keeps = w.map(_.getAs[Double]("keep_frac"))
    assert(keeps.forall(k => k > 0 && k <= 1.0 + 1e-12), "keep_frac out of (0,1]")
    assert(keeps.max > 1.0 - 1e-9, "no binding source at keep_frac 1")
    // taken tokens realize the target mixture exactly
    val takes = w.map(r => r.getAs[String]("source") -> r.getAs[Double]("take_tokens")).toMap
    val total = takes.values.sum
    w.foreach { r =>
      val frac = takes(r.getAs[String]("source")) / total
      assert(math.abs(frac - r.getAs[Double]("target_frac")) < 1e-9, s"mixture off for ${r}")
    }
  }

  test("contamination of a corpus against itself flags every doc at frac 1") {
    val out = Dedup.contamination(docs, docs, k = 5).collect()
    val withGrams = docs
      .select(graft.extensions.TextOps.tokens(col("text")).as("tk"))
      .where(size(col("tk")) >= 5)
      .count()
    assert(out.length == withGrams, s"${out.length} flagged vs $withGrams docs with >=1 5-gram")
    assert(out.forall(r => r.getAs[Double]("frac") == 1.0))
  }

  test("winnowPairs at w=1 degenerates to exact jaccardPairs") {
    // one-hash windows select every shingle hash: the fingerprint set IS
    // the distinct shingle-hash set, so similarities match jaccardPairs
    // value-for-value (collision-free poly hashes on this corpus)
    val jac = Dedup
      .jaccardPairs(docs, 0.5)
      .select(col("a_id"), col("b_id"), graft.ta.prim.normd(col("jac")).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val win = Dedup
      .winnowPairs(docs, 0.5, w = 1)
      .select(col("a_id"), col("b_id"), graft.ta.prim.normd(col("sim")).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(win == jac, s"missing=${jac -- win} spurious=${win -- jac}")
    assert(jac.nonEmpty, "fixture has no near-dup pairs; test is vacuous")
  }

  test("winnowing keeps recall on strong near-dups and compresses the index") {
    // fingerprint sets are ~2/(w+1) of the shingle count, yet every
    // jaccard-0.5 pair of this fixture still meets at w=4 (long shared
    // runs guarantee shared window-minima)
    val exact = pairSet(Dedup.jaccardPairs(docs, 0.5))
    val win = pairSet(Dedup.winnowPairs(docs, 0.3, w = 4))
    assert(exact.subsetOf(win), s"winnowing lost ${exact -- win}")
    val nSh = docs.select(explode(graft.extensions.TextOps.shingleSet(col("text")))).count()
    val nFp = Dedup.winnowFingerprints(docs).select(explode(col("fps"))).count()
    assert(nFp.toDouble / nSh < 0.7, s"no compression: $nFp fps vs $nSh shingles")
  }

  test("containment is asymmetric: an excerpt scores ~1 toward its superset") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d e f g h i j"), // superset
      (2L, "c d e f g"), // strict excerpt of 1: all 3 of its shingles in 1
      (3L, "x y z w v u")
    ).toDF("doc_id", "text")
    val cont = Dedup
      .containmentPairs(d, threshold = 0.9)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    assert(cont.keySet == Set((2L, 1L)), s"got ${cont.keySet}")
    assert(cont((2L, 1L)) == 1.0)
    // the same pair's Jaccard is well below threshold — containment sees
    // what jaccard can't
    assert(pairSet(Dedup.jaccardPairs(d, 0.9)).isEmpty)
    graft.CacheRegistry.release(spark)
  }

  test("boilerplate frac flags the repeated template, not the unique doc") {
    import spark.implicits._
    val tpl = "all rights reserved contact us here"
    val d = Seq(
      (1L, s"alpha beta gamma $tpl"),
      (2L, s"delta epsilon zeta $tpl"),
      (3L, s"eta theta iota $tpl"),
      (4L, "unique words only nothing shared at all")
    ).toDF("doc_id", "text")
    val st = Dedup
      .boilerplateStats(d, minDf = 3L)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // the 4 shingles fully inside the shared template have df=3
    assert(st(1L)._2 == 4 && st(2L)._2 == 4 && st(3L)._2 == 4)
    assert(st(4L)._2 == 0 && st(4L)._3 == 0.0)
    assert(st(1L)._3 > 0.4 && st(1L)._3 < 0.6) // 4 of 7 shingles hot
    graft.CacheRegistry.release(spark)
  }

  test("hot-shingle df-cap keeps high-similarity pairs") {
    val uncapped = pairSet(Dedup.jaccardPairs(docs, 0.5))
    val capped = pairSet(Dedup.jaccardPairs(docs, 0.5, maxDf = 50))
    // capping may drop borderline pairs whose overlap is only common
    // shingles, but must retain every pair found by both
    assert((uncapped -- capped).isEmpty || capped.subsetOf(uncapped))
    assert(capped.nonEmpty)
  }

  test("IVF top-k recall vs brute force is >= 0.9 at nprobe=4/16") {
    val e = Graft.table(spark, TestSpark.sfDir, "embeddings")
    val queries = e.where(col("vec_id") < 10)
    val brute = Similarity
      .topkBrute(e, queries, 5)
      .select("q_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val idx = Similarity.ivfIndex(e, 16)
    val ann = Similarity
      .topkIvf(idx, queries, 5, 16, 4)
      .select("q_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ann).size.toDouble / brute.size
    assert(recall >= 0.9, s"IVF recall $recall")
  }

  test("IVF append: merged index is probe-able and finds the appended vectors") {
    val e = Graft.table(spark, TestSpark.sfDir, "embeddings")
    val base = e.where(col("vec_id") % 10 =!= 0).select(col("vec_id"), col("embedding"))
    val batch = e.where(col("vec_id") % 10 === 0).select(col("vec_id"), col("embedding"))
    val merged = Similarity.ivfAppend(base, batch, 16)
    // base rows ride through untouched — the index was reused, not rebuilt
    val idxBase = Similarity
      .ivfIndex(base, 16)
      .select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mergedBase = merged
      .where(!col("is_new"))
      .select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mergedBase == idxBase)
    // the "new data is searchable immediately" contract: recall vs brute
    // force over the MERGED corpus stays high, and appended vectors show
    // up among the neighbors. Probe with the BASE-trained centroids (the
    // persisted-index path) — topkIvf's retrain-from-index-rows shortcut
    // would train over the merged rows and route queries against a
    // different centroid set than the one the cells were assigned under.
    val queries = e.where(col("vec_id") < 10).select(col("vec_id"), col("embedding"))
    val union = base.unionByName(batch)
    val brute = Similarity
      .topkBrute(union, queries, 5)
      .select("q_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity
      .topkIvfWithCents(merged.drop("is_new"), Similarity.kmeansCentroids(base, 16), queries, 5, 4)
      .select("q_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ann).size.toDouble / brute.size
    assert(recall >= 0.8, s"merged-index recall $recall")
    assert(ann.exists { case (_, n) => n % 10 == 0 }, "no appended vector ever retrieved")
  }

  test("filtered search returns only same-label neighbors; IVF-filtered recall >= 0.8") {
    val e = Graft.table(spark, TestSpark.sfDir, "embeddings")
    val queries = e.where(col("vec_id") < 10)
    val brute = Similarity.topkBruteFiltered(e, queries, 5, "label")
    // every neighbor shares its query's label (exactness of the filter)
    val labels = e.select(col("vec_id"), col("label")).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val pairs = brute.select("q_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty && pairs.forall { case (q, n) => labels(q) == labels(n) })
    // the approximate path: IVF cells + label predicate pushed into the
    // probe join; filtered recall is HARDER than unfiltered (a label's
    // matches spread over more cells than nprobe covers for tight k), so
    // the floor is 0.8 at nprobe=8/16
    val idx = Similarity
      .ivfIndex(e.select(col("vec_id"), col("embedding")), 16)
      .join(e.select(col("vec_id"), col("label")), "vec_id")
    val cents = Similarity.kmeansCentroids(e.select(col("vec_id"), col("embedding")), 16)
    val ann = Similarity
      .topkIvfFilteredWithCents(idx, cents, queries, 5, 8, "label")
      .select("q_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteSet = pairs.toSet
    val recall = (bruteSet & ann).size.toDouble / bruteSet.size
    assert(recall >= 0.8, s"filtered IVF recall $recall")
  }

  test("IVF-PQ top-k recall vs exact brute force is >= 0.9 (trained books)") {
    // two stacked approximations (cell routing + code scoring): the
    // composite trades a little recall for corpus-independent probe cost;
    // round-5 trained codebooks lifted the floor 0.8 -> 0.9
    val e = Graft.table(spark, TestSpark.sfDir, "embeddings")
    val queries = e.where(col("vec_id") < 10)
    val brute = Similarity
      .topkBrute(e, queries, 5)
      .select("q_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpq = Similarity
      .topkIvfPq(e, queries, k = 5, nCells = 16, nprobe = 4, m = 16, dim = 64, kC = 32, oversample = 8)
      .select("q_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivfpq).size.toDouble / brute.size
    assert(recall >= 0.9, s"IVF-PQ recall $recall")
  }

  test("int8-quantized top-k recall vs exact brute force is >= 0.9") {
    val e = Graft.table(spark, TestSpark.sfDir, "embeddings")
    val queries = e.where(col("vec_id") < 10)
    val brute = Similarity
      .topkBrute(e, queries, 5)
      .select("q_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Similarity
      .topkQuantized(e, queries, 5)
      .select("q_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & quant).size.toDouble / brute.size
    assert(recall >= 0.9, s"int8 recall $recall")
    // reconstruction error is small relative to the quantization step
    val mae = Similarity.quantError(e).agg(max("recon_mae")).collect()(0).getDouble(0)
    val maxScale = Similarity.quantizeInt8(e).agg(max("scale")).collect()(0).getDouble(0)
    assert(mae <= maxScale, s"mae $mae exceeds one quantization step $maxScale")
  }

  test("IVF results are invariant under a vec_id offset (non-contiguous ids)") {
    val e = Graft.table(spark, TestSpark.sfDir, "embeddings")
    val queries = e.where(col("vec_id") < 10)
    val base = Similarity
      .topkIvf(Similarity.ivfIndex(e, 16), queries, 5, 16, 4)
      .select("q_id", "rk", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // same corpus with ids shifted far past nCells: the probe-side
    // quantizer must still find the build-side centroid set
    val off = 100000L
    val eOff = e.withColumn("vec_id", col("vec_id") + off)
    val qOff = queries.withColumn("vec_id", col("vec_id") + off)
    val shifted = Similarity
      .topkIvf(Similarity.ivfIndex(eOff, 16), qOff, 5, 16, 4)
      .select("q_id", "rk", "nbr_id").collect()
      .map(r => (r.getLong(0) - off, r.getInt(1), r.getLong(2) - off)).toSet
    assert(shifted == base, s"missing=${base -- shifted} spurious=${shifted -- base}")
    assert(base.nonEmpty)
  }

  test("saved+loaded IVF index answers identically and prunes partitions") {
    val e = Graft.table(spark, TestSpark.sfDir, "embeddings")
    val queries = e.where(col("vec_id") < 10)
    val idx = Similarity.ivfIndex(e, 16)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_idx").toFile.getAbsolutePath
    Similarity.saveIvfIndex(idx, dir, nCells = 16)
    val loaded = Similarity.loadIvfIndex(spark, dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val mem = rows(Similarity.topkIvf(idx, queries, 5, 16, 4))
    val disk = rows(Similarity.topkIvf(loaded, queries, 5, 16, 4))
    assert(mem == disk)
    // the persisted-centroid path answers identically WITHOUT retraining
    // (no corpus pass: the quantizer comes off disk)
    val cents = Similarity.loadIvfCentroids(spark, dir)
    val noRetrain = rows(Similarity.topkIvfWithCents(loaded, cents, queries, 5, 4))
    assert(noRetrain == mem)
    // the broadcast probe join on the partition column must dynamic-prune
    // the cell-partitioned scan: I/O scales with cells probed, not corpus
    val plan = Similarity.topkIvfWithCents(loaded, cents, queries, 5, 4)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"), "no dynamic partition pruning on the index scan")
  }

  test("topkIvfLarge (shuffle join + heap) equals topkIvf (broadcast probes)") {
    val e = Graft.table(spark, TestSpark.sfDir, "embeddings")
    val queries = e.where(col("vec_id") < 10)
    val idx = Similarity.ivfIndex(e, 16)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("q_id"), col("rk").cast("long"), col("nbr_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val small = rows(Similarity.topkIvf(idx, queries, 5, 16, 4))
    val large = rows(Similarity.topkIvfLarge(idx, queries, 5, 16, 4))
    assert(large == small, s"missing=${small -- large} spurious=${large -- small}")
    assert(small.nonEmpty)
  }

  test("sign-LSH embedding near-dup: perfect precision, full recall above the borderline band") {
    val e = Graft.table(spark, TestSpark.sfDir, "embeddings")
    val exact = Similarity.cosinePairs(e, 0.45)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val lsh = pairSet(Similarity.cosineNeardupPairs(e, 0.45, dim = 64))
    // exact verification ⇒ no false positives, ever
    assert(lsh.subsetOf(exact.keySet), s"spurious=${lsh -- exact.keySet}")
    // LSH recall loss is confined to near-threshold pairs; everything
    // clearly above the threshold must be found (fixture max sim ≈ 0.479;
    // the one miss at sf0.001 sits at 0.454, just over the 0.45 line)
    val strong = exact.filter(_._2 >= 0.46).keySet
    assert(strong.subsetOf(lsh), s"missed strong pairs: ${strong -- lsh}")
    assert((lsh & exact.keySet).size.toDouble / exact.size >= 0.75)
    assert(strong.nonEmpty)
  }

  test("sign-LSH gate config (30 planes / 5 bands) is sub-quadratic and precise") {
    val e = Graft.table(spark, TestSpark.sfDir, "embeddings")
    val n = e.count()
    val exact = pairSet(Similarity.cosinePairs(e, 0.45))
    // the production 6-bit banding: candidates must be far below n² and
    // verification keeps precision perfect (every emitted pair is exact)
    val lshPairs = pairSet(Similarity.cosineNeardupPairs(e, 0.45, dim = 64, nPlanes = 30, bands = 5))
    assert(lshPairs.subsetOf(exact), "false positive survived exact verification")
    assert(lshPairs.nonEmpty, "gate config found no pairs; gate query would be vacuous")
    val planes = Similarity.hyperplanes(30, 64)
    val sigd = e.select(col("vec_id"), Similarity.hyperplaneSig(col("embedding"), planes).as("sig"))
    val banded = sigd.select(
      col("vec_id"),
      posexplode(array((0 until 5).map(b => pmod(shiftright(col("sig"), b * 6), lit(64L))): _*))
        .as(Seq("band", "bkey"))
    )
    val candVolume = banded.as("x").join(banded.as("y"), Seq("band", "bkey"))
      .where(col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id"), col("y.vec_id")).distinct().count()
    assert(candVolume < n * (n - 1) / 4, s"candidate volume $candVolume not sub-quadratic for n=$n")
  }

  test("rrf fusion: doc on both lists outranks single-list docs; absent side is 0") {
    import spark.implicits._
    import graft.extensions.Retrieval
    // doc 1 is rank 3 lexically AND rank 3 vectorially; docs 2/3 top one
    // list each but miss the other — consensus wins under rrf
    val lex = Seq((2L, 1), (4L, 2), (1L, 3)).toDF("doc_id", "rank")
    val vec = Seq((3L, 1), (5L, 2), (1L, 3)).toDF("doc_id", "rank")
    val out = Retrieval.rrfFuse(lex, vec, kk = 60, topK = 5).collect()
    assert(out.head.getLong(0) == 1L, s"consensus doc should rank first: ${out.toSeq}")
    val byDoc = out.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(math.abs(byDoc(1L) - 2.0 / 63.0) < 1e-12)
    assert(math.abs(byDoc(2L) - 1.0 / 61.0) < 1e-12) // r_vec null → 0
    // single-list docs tie across lists at equal rank; doc_id breaks it
    val order = out.map(_.getLong(0)).toSeq
    assert(order == Seq(1L, 2L, 3L, 4L, 5L), s"got $order")
  }

  test("mmr re-rank skips the near-duplicate of an already-picked doc") {
    import spark.implicits._
    import graft.extensions.Retrieval
    // docs 1/2 are the same direction (redundant twins), doc 3 orthogonal
    // with lower relevance; plain top-2 keeps both twins, MMR swaps the
    // second twin for the diverse doc
    val p = Seq(
      (1L, 1.00, Seq(1.0f, 0.0f)),
      (2L, 0.99, Seq(1.0f, 0.0f)),
      (3L, 0.60, Seq(0.0f, 1.0f))
    ).toDF("doc_id", "simq", "embedding")
    val out = Retrieval.mmrRerank(p, k = 2, lambda = 0.7).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L), s"got ${out.toSeq}")
    // first pick is pure relevance at full lambda weight
    assert(math.abs(out.head.getDouble(2) - 0.7) < 1e-12)
    // rank-2 score traded redundancy: 0.7*0.6 - 0.3*0 = 0.42 for doc 3
    // vs 0.7*0.99 - 0.3*1.0 = 0.393 for the twin
    assert(math.abs(out(1).getDouble(2) - 0.42) < 1e-12)
  }

  test("exact dedup keeps one row per distinct text") {
    val kept = Dedup.dropExactDups(docs)
    assert(kept.count() == docs.select("text").distinct().count())
    assert(kept.select("text").distinct().count() == kept.count())
  }

  test("PQ+rerank top-k recall vs brute force is >= 0.95; codes are 1/16 the bytes") {
    // round-5: per-subspace bounded-Lloyd books (iters=1) measured 0.98
    // vs 0.94 untrained at the same oversample — floor tightened
    val e = Graft.table(spark, TestSpark.sfDir, "embeddings")
    val queries = e.where(col("vec_id") < 10)
    val brute = Similarity
      .topkBrute(e, queries, 5)
      .select("q_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity
      .topkPq(e, queries, k = 5, m = 16, dim = 64, kC = 32, oversample = 8)
      .select("q_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & pq).size.toDouble / brute.size
    assert(recall >= 0.95, s"PQ recall $recall")
    // the index really is the compressed representation: m codes per vector
    // (16 byte-sized codes vs 64 × 4-byte floats)
    val idx = Similarity.pqIndex(e, 16, 64, 32)
    assert(idx.groupBy("vec_id").count().agg(max("count")).head.getLong(0) == 16L)
  }

  test("PQ results are invariant under a vec_id offset (dense code ids)") {
    val e = Graft.table(spark, TestSpark.sfDir, "embeddings")
    val queries = e.where(col("vec_id") < 10)
    def run(corpus: org.apache.spark.sql.DataFrame, qs: org.apache.spark.sql.DataFrame) =
      Similarity
        .topkPq(corpus, qs, k = 5, m = 16, dim = 64, kC = 32, oversample = 8)
        .select("q_id", "rk", "nbr_id")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .toSet
    val off = 100000L
    val base = run(e, queries)
    val shifted = run(
      e.withColumn("vec_id", col("vec_id") + off),
      queries.withColumn("vec_id", col("vec_id") + off)
    ).map { case (q, rk, n) => (q - off, rk, n - off) }
    assert(shifted == base)
  }

  test("new operators survive degenerate inputs (empty and single-token docs)") {
    import spark.implicits._
    val weird = Seq((1L, ""), (2L, "one"), (3L, "a b"), (4L, "a b c d e f g h")).toDF("doc_id", "text")
    // winnowing: no shingles → no fingerprints → no pairs, no rows lost
    assert(Dedup.winnowFingerprints(weird).count() == 4)
    assert(Dedup.winnowPairs(weird, 0.1).count() == 0)
    // contamination of junk against junk: only docs with >= 1 5-gram flag
    assert(Dedup.contamination(weird, weird, k = 5).count() == 1)
    // bm25 with terms absent from the corpus: empty result, no crash
    assert(graft.extensions.Retrieval.bm25(weird, Seq("zz_missing")).count() == 0)
    // surprisal: every doc with >= 1 token scores
    assert(graft.extensions.Retrieval.unigramSurprisal(weird).count() == 3)
    // incremental LSH with an empty batch: no pairs
    val none = weird.where(col("doc_id") < 0)
    assert(Dedup.minhashLshPairsAgainst(weird, none, 0.5).count() == 0)
  }

  test("trained quantizers survive empty and shorter-than-k corpora") {
    import spark.implicits._
    val spark0 = spark
    import org.apache.spark.sql.functions.{col, transform => htransform, sequence, lit}
    def vecs(n: Int) = spark0
      .range(n)
      .select(
        col("id").as("vec_id"),
        htransform(sequence(lit(0), lit(7)), j => (col("id") * 1 + j).cast("double").cast("float"))
          .as("embedding")
      )
    // empty corpus: no centroids, no codebooks — and no analysis-time
    // crash from a zero-entry assignment array in the Lloyd pass
    assert(graft.extensions.Similarity.kmeansCentroids(vecs(0), nCells = 4, iters = 2).count() == 0)
    assert(graft.extensions.Similarity.pqCodebooks(vecs(0), m = 2, dim = 8, kC = 4, iters = 2).count() == 0)
    // corpus shorter than k: train what exists (3 centroids / 3 codes per
    // subspace), never index past the init rows
    assert(graft.extensions.Similarity.kmeansCentroids(vecs(3), nCells = 8, iters = 1).count() == 3)
    assert(graft.extensions.Similarity.pqCodebooks(vecs(3), m = 2, dim = 8, kC = 8, iters = 1).count() == 6)
    // empty z-ordered write: plain empty parquet, no NPE on null stats
    val dir = java.nio.file.Files.createTempDirectory("graft_zn_empty").toFile.getAbsolutePath
    graft.sources.Layout.writeZOrderedN(vecs(0).select(col("vec_id"), col("vec_id").as("v2")), dir, Seq("vec_id", "v2"))
    assert(spark0.read.parquet(dir).count() == 0)
  }

  test("clustering an edgeless pair graph yields all singletons") {
    import spark.implicits._
    val d = Seq((1L, "aa"), (2L, "bb"), (3L, "cc")).toDF("doc_id", "text")
    val noPairs = spark.emptyDataset[(Long, Long)].toDF("a_id", "b_id")
    val got = Dedup.nearDupClusters(d, noPairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(got == Set((1L, 1L, 1L, true), (2L, 2L, 1L, true), (3L, 3L, 1L, true)))
  }

  test("clustering an empty corpus returns empty (no NPE on the null sum)") {
    import spark.implicits._
    val d = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val p = Seq((1L, 2L)).toDF("a_id", "b_id")
    assert(Dedup.nearDupClusters(d, p).count() == 0)
  }

  test("winnowPairs hot-fingerprint cap with no hot fps equals oracle mode") {
    // exercises the capped path's recomputed denominators: a cap high
    // enough to drop nothing must reproduce the exact (maxDf=0) result
    val exact = pairSet(Dedup.winnowPairs(docs, 0.3, w = 4))
    val capped = pairSet(Dedup.winnowPairs(docs, 0.3, w = 4, maxDf = 1000000L))
    assert(capped == exact)
    assert(exact.nonEmpty, "no winnow pairs in fixture; vacuous")
  }

  test("tfidf cosine pairs are partition-invariant (ordered FP folds)") {
    def pairs(parts: Int) =
      Dedup
        .tfidfCosinePairs(docs.repartition(parts), 0.9)
        .select(col("a_id"), col("b_id"), graft.ta.prim.normd(col("cos")).as("cos"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
    val p1 = pairs(1)
    assert(p1 == pairs(32))
    assert(p1.nonEmpty, "no tfidf near-dup pairs in fixture; vacuous")
  }

  test("near-dup clustering equals driver-side union-find over the pair set") {
    val pairs = Dedup.jaccardPairs(docs, 0.5)
    val edgeList = pairSet(pairs).toSeq
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    // reference: classic union-find with path compression
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edgeList.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = ids.map(i => i -> find(i)).toMap
    val got = Dedup
      .nearDupClusters(docs, pairs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.map(g => g._1 -> g._2).toMap == expected)
    // cluster sizes and keep flags are self-consistent
    val bySz = expected.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { case (id, cl, n, keep) =>
      assert(n == bySz(cl)); assert(keep == (id == cl))
    }
    assert(expected.values.toSet.size < ids.length, "fixture has no non-trivial clusters; vacuous")
    val kept = Dedup.dropNearDups(docs, pairs)
    assert(kept.count() == expected.values.toSet.size)
  }
}
