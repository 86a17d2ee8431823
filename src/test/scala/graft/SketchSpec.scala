package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.extensions.Sketch

/** Sketch-layer guarantees that the oracle gate cannot express:
  * KMV exactness below capacity + merge associativity + error bound at
  * capacity, CMS's one-sided error, Bloom's zero-false-negative contract
  * on adversarial (dense sequential) key sets.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("KMV is exact below capacity (sketch == the distinct hash set)") {
    val df = spark.range(0, 50).select((col("id") % 17 * 1234567L % Sketch.P).as("h"))
    val out = df.agg(Sketch.kmv(col("h"), 128).as("kmv")).head()
    val got = out.getSeq[Long](0)
    val want = df.select("h").distinct().as[Long].collect().sorted.toSeq
    assert(got == want)
  }

  test("KMV estimate at capacity is within 3/sqrt(k) of the true cardinality") {
    val n = 20000
    val k = 256
    // spread hashes pseudo-uniformly over [0, P) with the sketch's own family
    val df = spark.range(0, n).select(Sketch.rehash(col("id"), 1).as("h"))
    val trueN = df.distinct().count().toDouble
    val est = df
      .agg(Sketch.kmv(col("h"), k).as("kmv"))
      .select(Sketch.kmvEstimate(col("kmv"), k).as("est"))
      .as[Double]
      .head()
    val relErr = math.abs(est - trueN) / trueN
    assert(relErr < 3.0 / math.sqrt(k.toDouble), s"rel err $relErr (est $est vs $trueN)")
  }

  test("KMV group sketches merged == global sketch (merge associativity)") {
    val k = 64
    val df = spark
      .range(0, 5000)
      .select((col("id") % 7).as("g"), Sketch.rehash(col("id"), 2).as("h"))
    // global sketch in one aggregate
    val global = df.agg(Sketch.kmv(col("h"), k)).head().getSeq[Long](0)
    // per-group sketches, re-aggregated by exploding the arrays (k smallest
    // of the union of per-group k-smallest == k smallest of the union —
    // the KMV merge identity)
    val merged = df
      .groupBy("g")
      .agg(Sketch.kmv(col("h"), k).as("kmv"))
      .select(explode(col("kmv")).as("h"))
      .agg(Sketch.kmv(col("h"), k))
      .head()
      .getSeq[Long](0)
    assert(merged == global)
  }

  test("KMV set-operation estimates: exact below merged capacity, bounded above it") {
    val k = 256
    // A = hashes of 0..2999, B = hashes of 2000..4999 → |A∩B| = 1000
    def sk(lo: Long, hi: Long) = spark
      .range(lo, hi)
      .select(Sketch.rehash(col("id"), 3).as("h"))
      .agg(Sketch.kmv(col("h"), k).as("kmv"))
      .head()
      .getSeq[Long](0)
    import spark.implicits._
    def est(a: Seq[Long], b: Seq[Long]) = Seq((a, b))
      .toDF("a", "b")
      .select(
        Sketch.kmvIntersectEstimate(col("a"), col("b"), k).as("i"),
        Sketch.kmvUnionEstimate(col("a"), col("b"), k).as("u")
      )
      .head()
    // below capacity: tiny sets → exact intersection and union
    val small = est(sk(0, 100), sk(50, 150))
    assert(small.getDouble(0) == 50.0, s"got $small")
    assert(small.getDouble(1) == 150.0, s"got $small")
    // at capacity: union 5000, intersection 1000 (Jaccard 0.2) — the
    // estimator's absolute error is O(unionEst/√k·…); accept ±40%
    val big = est(sk(0, 3000), sk(2000, 5000))
    assert(math.abs(big.getDouble(1) - 5000.0) / 5000.0 < 0.2, s"union est ${big.getDouble(1)}")
    assert(math.abs(big.getDouble(0) - 1000.0) / 1000.0 < 0.4, s"intersect est ${big.getDouble(0)}")
  }

  test("CMS estimates are a one-sided overestimate for every term") {
    val terms = spark
      .range(0, 3000)
      .select(concat(lit("t"), (col("id") % 37)).as("term"))
    val counters = Sketch.cmsCounters(terms, "term", d = 4, w = 8)
    val exact = terms.groupBy("term").agg(count(lit(1)).as("n_exact"))
    val both = Sketch
      .cmsEstimate(exact, "term", counters, d = 4, w = 8)
      .select(col("term"), col("n_exact"), col("n_est"))
      .collect()
    assert(both.length == 37)
    both.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"CMS underestimated ${r.getString(0)}")
    }
  }

  test("CMS estimates unseen candidates instead of dropping them") {
    import spark.implicits._
    // corpus touches few buckets (w large vs 3 distinct terms), so an
    // unseen candidate almost surely hits an empty bucket in some row —
    // the estimate must be a 0-coalesced min, never a vanished row
    val terms = spark
      .range(0, 300)
      .select(concat(lit("seen"), (col("id") % 3)).as("term"))
    val counters = Sketch.cmsCounters(terms, "term", d = 4, w = 512)
    val candidates = Seq("seen0", "never_in_corpus_a", "never_in_corpus_b").toDF("term")
    val est = Sketch
      .cmsEstimate(candidates, "term", counters, d = 4, w = 512)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(est.keySet == Set("seen0", "never_in_corpus_a", "never_in_corpus_b"))
    assert(est("seen0") == 100L)
    assert(est("never_in_corpus_a") == 0L, s"got $est")
    assert(est("never_in_corpus_b") == 0L, s"got $est")
  }

  test("Bloom filter has zero false negatives on a dense sequential key set") {
    val keys = spark.range(100, 600).select(col("id").as("k"))
    val words = Sketch.bloomBuild(keys, "k", bits = 4096, kHash = 3)
    val missed = keys
      .where(!Sketch.bloomContains(col("k"), words, bits = 4096, kHash = 3))
      .count()
    assert(missed == 0L)
    // and it actually rejects most non-members (sanity, not a guarantee)
    val fp = spark
      .range(10000, 30000)
      .where(Sketch.bloomContains(col("id"), words, bits = 4096, kHash = 3))
      .count()
    assert(fp < 2000L, s"implausible FP count $fp / 20000")
  }

  test("KMV in a streaming aggregation == batch sketch (micro-batch state merges)") {
    val k = 64
    val rows = (0L until 3000L).map(i => (s"g${i % 3}", (i * 733L + 17L) % Sketch.P))
    val dir = java.nio.file.Files.createTempDirectory("graft_kmv_stream").toFile
    rows.grouped(1000).zipWithIndex.foreach { case (chunk, i) =>
      spark
        .createDataset(chunk)
        .toDF("g", "h")
        .coalesce(1)
        .write
        .parquet(f"$dir/c$i%03d")
    }
    val stream = spark.readStream
      .schema("g STRING, h BIGINT")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/c*")
    val q = stream
      .groupBy("g")
      .agg(Sketch.kmv(col("h"), k).as("kmv"))
      .writeStream
      .format("memory")
      .queryName("kmv_stream")
      .outputMode("complete")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark
      .table("kmv_stream")
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1))
      .toMap
    val batch = spark
      .createDataset(rows)
      .toDF("g", "h")
      .groupBy("g")
      .agg(Sketch.kmv(col("h"), k).as("kmv"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1))
      .toMap
    assert(streamed == batch)
  }

  test("histogram counters merge by addition: shard halves sum to the whole") {
    val d = Graft
      .table(spark, TestSpark.sfDir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    val stats = d.groupBy("event_type").agg(min("value").as("mn"), max("value").as("mx"))
    def toMap(h: org.apache.spark.sql.DataFrame) =
      h.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = toMap(Sketch.histCounters(d, "event_type", "value", stats, 128))
    // shards bucket against the SAME global stats — the merge contract
    val h1 = toMap(Sketch.histCounters(d.where(col("event_id") % 2 === 0), "event_type", "value", stats, 128))
    val h2 = toMap(Sketch.histCounters(d.where(col("event_id") % 2 === 1), "event_type", "value", stats, 128))
    val merged = (h1.keySet ++ h2.keySet).map(k => k -> (h1.getOrElse(k, 0L) + h2.getOrElse(k, 0L))).toMap
    assert(merged == whole)
  }

  test("histogram quantile estimate is within one bucket width of exact") {
    val out = graft.SparkEntry.queries("x_hist_quantiles")(spark, TestSpark.sfDir).collect()
    val d = Graft.table(spark, TestSpark.sfDir, "events")
    val widths = d
      .groupBy("event_type")
      .agg(((max("value") - min("value")) / 128.0).as("w"))
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    out.foreach { r =>
      val w = widths(r.getString(0))
      for ((ex, es) <- Seq((2, 3), (4, 5), (6, 7))) {
        val err = math.abs(r.getDouble(ex) - r.getDouble(es))
        // left-edge estimate: at most one bucket below the true value
        assert(err <= w + 1e-9, s"${r.getString(0)}: err $err > bucket width $w")
      }
    }
  }

  test("count-min counters from a STREAM == batch counters (streaming heavy hitters)") {
    // the streaming frequency-sketch shape: counters are a running groupBy
    // aggregate (outputMode complete), so each micro-batch's counts merge
    // into the d×w table exactly as partial aggregation does in batch
    val (d, w) = (4, 16)
    val terms = (0L until 2400L).map(i => s"t${i % 37}")
    val dir = java.nio.file.Files.createTempDirectory("graft_cms_stream").toFile
    terms.grouped(800).zipWithIndex.foreach { case (chunk, i) =>
      spark.createDataset(chunk).toDF("term").coalesce(1).write.parquet(f"$dir/c$i%03d")
    }
    val stream = spark.readStream
      .schema("term STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/c*")
    val q = Sketch
      .cmsCounters(stream, "term", d, w)
      .writeStream
      .format("memory")
      .queryName("cms_stream")
      .outputMode("complete")
      .start()
    q.processAllAvailable()
    q.stop()
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val streamed = toMap(spark.table("cms_stream"))
    val batch = toMap(Sketch.cmsCounters(spark.createDataset(terms).toDF("term"), "term", d, w))
    assert(streamed == batch)
    // and the merged counters estimate through the same point-read path
    val cand = spark.createDataset(Seq("t0", "t36", "absent")).toDF("term")
    val est = Sketch
      .cmsEstimate(cand, "term", spark.table("cms_stream")
        .toDF("__cms_i", "__cms_bkt", "__cms_cnt"), d, w)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    // CMS never underestimates: true counts are 65 for t0, 64 for t36
    assert(est("t0") >= 65L && est("t36") >= 64L)
  }

  test("bloomContains filters a STREAM statelessly (the streaming decontamination shape)") {
    val keys = spark.range(0, 200).select(col("id").as("k"))
    val words = Sketch.bloomBuild(keys, "k", bits = 4096, kHash = 3)
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom_stream").toFile
    spark.range(0, 1000).select(col("id")).coalesce(1).write.parquet(s"$dir/c0")
    val stream = spark.readStream
      .schema("id BIGINT")
      .parquet(s"$dir/c*")
      .where(Sketch.bloomContains(col("id"), words, bits = 4096, kHash = 3))
    val q = stream.writeStream
      .format("memory")
      .queryName("bloom_stream")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("bloom_stream").collect().map(_.getLong(0)).toSet
    val batch = spark
      .range(0, 1000)
      .toDF("id")
      .where(Sketch.bloomContains(col("id"), words, bits = 4096, kHash = 3))
      .collect()
      .map(_.getLong(0))
      .toSet
    assert(streamed == batch)
    assert((0L until 200L).toSet.subsetOf(streamed)) // no false negatives on the stream
  }

  test("Bloom keeps the no-false-negative contract for NEGATIVE keys (pmod hashing)") {
    val keys = spark.range(0, 400).select((col("id") - 200).as("k")) // −200..199
    val words = Sketch.bloomBuild(keys, "k", bits = 4096, kHash = 3)
    val missed = keys
      .where(!Sketch.bloomContains(col("k"), words, bits = 4096, kHash = 3))
      .count()
    assert(missed == 0L)
  }

  test("degenerate inputs: empty build sets and empty corpora do not crash") {
    // empty bloom build → all-zero words → contains is false everywhere
    val empty = spark.range(0).select(col("id").as("k"))
    val words = Sketch.bloomBuild(empty, "k", bits = 4096, kHash = 3)
    assert(words.forall(_ == 0L))
    val pass = spark
      .range(0, 100)
      .where(Sketch.bloomContains(col("id"), words, bits = 4096, kHash = 3))
      .count()
    assert(pass == 0L)
    // KMV over zero rows → empty sketch, estimate 0
    val est = spark
      .range(0)
      .select(col("id").as("h"))
      .agg(Sketch.kmv(col("h"), 64).as("kmv"))
      .select(Sketch.kmvEstimate(col("kmv"), 64))
      .head()
      .getDouble(0)
    assert(est == 0.0)
    // CMS counters over zero terms → empty counter table, estimates empty
    val noTerms = spark.range(0).select(col("id").cast("string").as("term"))
    val counters = Sketch.cmsCounters(noTerms, "term", d = 2, w = 8)
    assert(counters.count() == 0L)
    assert(Sketch.cmsEstimate(noTerms, "term", counters, d = 2, w = 8).count() == 0L)
  }

  test("bloomContains compiles to a scan-side expression — no join, no shuffle") {
    val keys = spark.range(0, 100).select(col("id").as("k"))
    val words = Sketch.bloomBuild(keys, "k", bits = 4096, kHash = 3)
    val probe = spark
      .range(0, 1000)
      .where(Sketch.bloomContains(col("id"), words, bits = 4096, kHash = 3))
    val plan = probe.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"probe plan shuffles:\n$plan")
    assert(!plan.contains("Join"), s"probe plan joins:\n$plan")
  }
}
