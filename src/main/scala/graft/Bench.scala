package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Round benchmark: one JSON line with per-query warm seconds, also
  * written to BENCH_out.json (stdout of a long run can get truncated by
  * the capture — the file is the parse-safe copy).
  *
  * BASELINE.md protocol: single warm session, shuffle partitions ≤ cores,
  * per query 2 untimed warm-ups then median of 5 timed reps
  * (SPARK_GRAFT_REPS / SPARK_GRAFT_WARMUPS to override). A query that
  * throws is recorded under "failed" with its error — never as a timing —
  * so a regression cannot masquerade as a speedup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val warmups = sys.env.getOrElse("SPARK_GRAFT_WARMUPS", "2").toInt
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_out.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed session warm-up: JVM/codegen/file-index costs land here, not
    // on whichever query happens to run first (BASELINE.md compares warm).
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      SparkEntry.queries.get("q01_bars").foreach(_(spark, sfDir).count())
    } catch { case _: Throwable => }
    def esc(s: String): String = s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    }
    val timed = scala.collection.mutable.LinkedHashMap[String, Double]()
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        (1 to warmups).foreach(_ => fn(spark, sfDir).count())
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        timed(name) = times(times.size / 2)
      } catch {
        case e: Throwable =>
          failed(name) = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"
      }
    }
    val qs = timed.map { case (k, v) => "\"" + esc(k) + "\":" + v }.mkString("{", ",", "}")
    val fs = failed.map { case (k, v) => "\"" + esc(k) + "\":\"" + esc(v) + "\"" }.mkString("{", ",", "}")
    val total = timed.values.sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"warmups":$warmups,"n_ok":${timed.size},"n_failed":${failed.size},"failed":$fs,"queries":$qs,"sf":"$sfDir"}"""
    Files.writeString(Paths.get(outPath), json)
    println(json)
    CacheRegistry.release(spark)
    spark.stop()
  }
}
