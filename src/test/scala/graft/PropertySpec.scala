package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ta.Ta._

/** SURVEY §5.2(3): property checks over generated series — bounds,
  * constant-series fixpoints, warm-up null counts, shift equivariance.
  * Deterministic RNG (fixed seed) instead of scalacheck's runner so the
  * suite stays reproducible.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def randomBars(seed: Long, rows: Int = 120): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    var price = 100.0
    val data = (1 to rows).map { t =>
      price = math.max(1.0, price * (1.0 + (rnd.nextDouble() - 0.5) * 0.1))
      val o = price * (1.0 + (rnd.nextDouble() - 0.5) * 0.02)
      val c = price * (1.0 + (rnd.nextDouble() - 0.5) * 0.02)
      val h = math.max(o, c) * (1.0 + rnd.nextDouble() * 0.02)
      val l = math.min(o, c) * (1.0 - rnd.nextDouble() * 0.02)
      ("S" + (t % 3), t.toLong, o, h, l, c, 100.0 + rnd.nextInt(900))
    }
    data.toDF("series_id", "ts", "open", "high", "low", "close", "volume")
  }

  private def colVals(df: DataFrame, c0: String): Seq[Double] =
    df.select(c0).collect().toSeq.flatMap(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))

  test("bounds: rsi/stoch in [0,100], willr in [-100,0], er in [0,1]") {
    (1L to 3L).foreach { seed =>
      val df = randomBars(seed).ta.rsi(14).ta.stoch(14, 3, 3).ta.willr(14).ta.er(10)
      colVals(df, "rsi_14").foreach(v => assert(v >= 0 && v <= 100, s"rsi $v"))
      colVals(df, "stoch_k").foreach(v => assert(v >= -1e-9 && v <= 100 + 1e-9, s"stoch $v"))
      colVals(df, "willr_14").foreach(v => assert(v >= -100 - 1e-9 && v <= 1e-9, s"willr $v"))
      colVals(df, "er_10").foreach(v => assert(v >= 0 && v <= 1 + 1e-9, s"er $v"))
    }
  }

  test("constant series fixpoints: sma=const, atr=0, rsi undefined, bbands collapse") {
    import spark.implicits._
    val const = (1 to 60).map(t => ("K", t.toLong, 50.0, 50.0, 50.0, 50.0, 10.0))
      .toDF("series_id", "ts", "open", "high", "low", "close", "volume")
    val out = const.ta.sma(10).ta.atr(10).ta.rsi(10).ta.bbands(5, 2.0)
    colVals(out, "sma_10").foreach(v => assert(v == 50.0))
    colVals(out, "atr_10").foreach(v => assert(v == 0.0))
    // rsi: up = dn = 0 → division by zero → null everywhere
    assert(colVals(out, "rsi_10").isEmpty)
    colVals(out, "bbu_5_2").foreach(v => assert(v == 50.0))
    colVals(out, "bbl_5_2").foreach(v => assert(v == 50.0))
  }

  test("warm-up null counts equal n-1 per series for W-class") {
    val df = randomBars(7L)
    val out = df.ta.sma(10).ta.stdev(10)
    Seq("sma_10", "stdev_10").foreach { c0 =>
      val nulls = out
        .groupBy("series_id")
        .agg(sum(when(col(c0).isNull, 1).otherwise(0)).as("n"))
        .collect()
        .map(_.getAs[Long]("n"))
      nulls.foreach(n => assert(n == 9, s"$c0 warm-up nulls = $n"))
    }
  }

  test("shift equivariance: indicator(lagged series) = lag(indicator)") {
    val df = randomBars(11L).where(col("series_id") === "S1")
    val base = df.ta.sma(10).ta.rsi(10)
      .select("ts", "sma_10", "rsi_10").orderBy("ts").collect()
    // drop the first 5 rows and recompute: results must match the
    // original from the point where the window no longer sees them
    val shifted = df.where(col("ts") > 15).ta.sma(10).ta.rsi(10)
      .select("ts", "sma_10", "rsi_10").orderBy("ts").collect()
    val byTs = base.map(r => r.getLong(0) -> r).toMap
    // sma over 10 rows: identical once the window is fully inside the kept
    // range (skip warm-up rows on the truncated side)
    var checked = 0
    shifted.filter(!_.isNullAt(1)).drop(10).foreach { r =>
      val b = byTs(r.getLong(0))
      assert(math.abs(r.getDouble(1) - b.getDouble(1)) < 1e-9, "sma differs after warm-up")
      checked += 1
    }
    assert(checked > 5, "equivariance check exercised too few rows")
  }

  test("int8 quantization: every element reconstructs within half a step") {
    // round-to-nearest guarantee: |x − code·scale| ≤ scale/2, and codes
    // stay inside [−127, 127] because scale = max|x|/127
    val e = Graft.table(spark, TestSpark.sfDir, "embeddings")
    val q = graft.extensions.Similarity.quantizeInt8(e)
    val bad = e
      .join(q, "vec_id")
      .where(col("scale").isNotNull)
      .select(
        exists(
          zip_with(
            col("codes"),
            col("embedding"),
            (c, x) => abs(c * col("scale") - x.cast("double")) > col("scale") * 0.5 + lit(1e-12)
          ),
          x => x
        ).as("err"),
        exists(col("codes"), c => abs(c) > 127).as("oob")
      )
      .where(col("err") || col("oob"))
      .count()
    assert(bad == 0, s"$bad vectors violate the quantization bound")
  }

  test("winnowing fingerprints are a subset of the shingle hashes") {
    val docs = Graft.table(spark, TestSpark.sfDir, "documents")
    import graft.extensions.TextOps
    val bad = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
      .select(
        col("doc_id"),
        TextOps.winnowFromHashes(TextOps.posShingleHashes(col("tk")), 4).as("fps"),
        TextOps.shingleBasesFromTokens(col("tk")).as("all_h")
      )
      .where(size(array_except(col("fps"), col("all_h"))) > 0)
      .count()
    assert(bad == 0, "winnow selected a hash outside the document's shingle set")
  }

  test("non-overlapping chunks reconstruct the tokenized document") {
    import graft.extensions.TextOps
    val docs = Graft.table(spark, TestSpark.sfDir, "documents")
    val bad = docs
      .select(col("doc_id"), col("text"), TextOps.tokens(col("text")).as("tk"))
      .where(size(col("tk")) > 0)
      .select(
        col("doc_id"),
        concat_ws(" ", col("tk")).as("norm_text"),
        concat_ws(
          " ",
          transform(TextOps.chunkTokens(col("tk"), 32, 32), c => c.getField("chunk"))
        ).as("rebuilt")
      )
      .where(col("norm_text") =!= col("rebuilt"))
      .count()
    assert(bad == 0, s"$bad docs fail chunk reconstruction")
  }

  test("contamination hit counts are monotone in the eval set") {
    val docs = Graft.table(spark, TestSpark.sfDir, "documents")
    val train = docs.where(col("doc_id") % 20 =!= 3)
    val evalSmall = docs.where(col("doc_id") % 20 === 3 && col("doc_id") < 250)
    val evalBig = docs.where(col("doc_id") % 20 === 3)
    def hits(ev: org.apache.spark.sql.DataFrame) =
      graft.extensions.Dedup
        .contamination(train, ev, k = 5)
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
    val hs = hits(evalSmall); val hb = hits(evalBig)
    hs.foreach { case (id, n) =>
      assert(hb.getOrElse(id, 0L) >= n, s"doc $id lost hits when the eval set grew")
    }
  }

  test("linearity: sma and wma commute with affine transforms") {
    val df = randomBars(13L)
    val a = 2.5; val b = -7.0
    val direct = df.withColumn("close", col("close") * a + b).ta.sma(10).ta.wma(10)
    val post = df.ta.sma(10).ta.wma(10)
      .withColumn("sma_t", col("sma_10") * a + b)
      .withColumn("wma_t", col("wma_10") * a + b)
    val d1 = direct.select("series_id", "ts", "sma_10", "wma_10").orderBy("series_id", "ts").collect()
    val d2 = post.select("series_id", "ts", "sma_t", "wma_t").orderBy("series_id", "ts").collect()
    d1.zip(d2).foreach { case (x, y) =>
      if (!x.isNullAt(2)) assert(math.abs(x.getDouble(2) - y.getDouble(2)) < 1e-8)
      if (!x.isNullAt(3)) assert(math.abs(x.getDouble(3) - y.getDouble(3)) < 1e-8)
    }
  }
}
