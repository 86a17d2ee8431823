package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamingTa
import graft.ta.Ta._
import java.nio.file.Files

/** Round-11: the arbitrary-column signal utils stream directly via
  * signalsStream over ANY keyed ordered frame (here: ma columns computed
  * upstream, with their warm-up nulls exercising the null paths), and
  * equal the batch df.ta.tsignals/xsignals/longRun/shortRun row-for-row. */
class SignalsStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("signalsStream equals batch tsignals/xsignals/long_run/short_run") {
    import spark.implicits._
    Graft.init(spark)
    val frame = Graft
      .bars(spark, TestSpark.sfDir)
      .select(
        col("series_id").cast("string").as("series_id"),
        unix_date(col("ts")).cast("long").as("ts"),
        col("close"))
      .selectExpr(
        "series_id", "ts", "close",
        "graft_sma(close, 3) AS a",
        "graft_sma(close, 7) AS b")
      .withColumn("tr", when(col("a") > col("b"), 1.0).otherwise(0.0))

    val rows = frame.orderBy("ts").collect()
    val srcDir = Files.createTempDirectory("graft_sigstream").toFile
    rows.grouped(7).zipWithIndex.foreach { case (chunk, i) =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(chunk.toSeq, 1), frame.schema)
      df.coalesce(1).write.parquet(s"$srcDir/c$i")
      val f = new java.io.File(s"$srcDir/c$i").listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(f.toPath, new java.io.File(srcDir, f"k$i%03d.parquet").toPath)
      Thread.sleep(20)
    }
    def stream() = spark.readStream.schema(frame.schema).option("maxFilesPerTrigger", "1")
      .parquet(srcDir.getAbsolutePath)

    def norm(v: Any): Any = v match {
      case null => null
      case d: Double => math.rint(d * 1e6) / 1e6
      case other => other
    }
    def run(name: String, out: org.apache.spark.sql.DataFrame): Map[Long, org.apache.spark.sql.Row] = {
      val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
      q.processAllAvailable(); q.stop()
      spark.table(name).collect().map(r => r.getAs[Long]("ts") -> r).toMap
    }

    // tsignals over the trend column
    val sT = run("sig_ts", StreamingTa.signalsStream(stream(), "tsignals", Seq("tr")))
    val bT = frame.ta.tsignals("tr").orderBy("ts").collect()
    assert(sT.size == rows.length)
    bT.foreach { br =>
      Seq("ts_trends", "ts_entries", "ts_exits").foreach { c0 =>
        assert(norm(sT(br.getAs[Long]("ts")).getAs[Any](c0)) == norm(br.getAs[Any](c0)),
          s"tsignals/$c0 @ts=${br.getAs[Long]("ts")}")
      }
    }

    // xsignals over (a, b) — incl. warm-up nulls in both
    val sX = run("sig_xs", StreamingTa.signalsStream(stream(), "xsignals", Seq("a", "b")))
    val bX = frame.ta.xsignals("a", "b").orderBy("ts").collect()
    bX.foreach { br =>
      Seq("ts_trends", "ts_entries", "ts_exits").foreach { c0 =>
        assert(norm(sX(br.getAs[Long]("ts")).getAs[Any](c0)) == norm(br.getAs[Any](c0)),
          s"xsignals/$c0 @ts=${br.getAs[Long]("ts")}")
      }
    }

    // long_run / short_run over (a, b) with n=2
    val sL = run("sig_lr", StreamingTa.signalsStream(stream(), "long_run", Seq("a", "b"), 2))
    val bL = frame.ta.longRun("a", "b", 2).orderBy("ts").collect()
    bL.foreach { br =>
      assert(norm(sL(br.getAs[Long]("ts")).getAs[Any]("long_run")) == norm(br.getAs[Any]("long_run")),
        s"long_run @ts=${br.getAs[Long]("ts")}")
    }
    val sS = run("sig_sr", StreamingTa.signalsStream(stream(), "short_run", Seq("a", "b"), 2))
    val bS = frame.ta.shortRun("a", "b", 2).orderBy("ts").collect()
    bS.foreach { br =>
      assert(norm(sS(br.getAs[Long]("ts")).getAs[Any]("short_run")) == norm(br.getAs[Any]("short_run")),
        s"short_run @ts=${br.getAs[Long]("ts")}")
    }
  }
}
