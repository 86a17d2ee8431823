package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import graft.operators.RangeJoin

/** RangeJoin = binned equi-join + exact filter; pairs must equal the
  * brute-force inequality join (including bin-boundary timestamps) and
  * the plan must stay a hash join — never BroadcastNestedLoop. */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("binned range join equals the brute-force inequality join") {
    import spark.implicits._
    // timestamps engineered to sit ON and AROUND bin boundaries for
    // w = lower+upper+1 = 10: exact DIV binning must not drop edge pairs
    val rows = for {
      k <- Seq("a", "b")
      t <- Seq(0L, 1L, 9L, 10L, 11L, 19L, 20L, 21L, 29L, 30L, 100L, 105L, 109L, 110L)
    } yield (k, t, t.toDouble / 7.0)
    val df = rows.toDF("series_id", "ts", "close")
    val (lower, upper) = (9L, 0L)

    val binned = RangeJoin
      .within(df, df, "series_id", "ts", lower, upper)
      .select(col("series_id"), col("ts"), col("r_ts"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet

    val brute = df.as("l")
      .join(df.as("r"), col("l.series_id") === col("r.series_id") &&
        col("r.ts") >= col("l.ts") - lower && col("r.ts") <= col("l.ts") + upper)
      .select(col("l.series_id"), col("l.ts"), col("r.ts"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet

    assert(binned == brute, s"binned ${binned.size} vs brute ${brute.size}")
    assert(brute.nonEmpty)
  }

  test("range join plans as a hash join, not BroadcastNestedLoop") {
    import spark.implicits._
    val df = (1 to 100).map(i => ("k", i.toLong * 3, i.toDouble)).toDF("series_id", "ts", "close")
    val out = RangeJoin.within(df, df, "series_id", "ts", 10L, 0L)
    out.collect()
    val plan = out.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val bnl = plan.collect { case b: BroadcastNestedLoopJoinExec => b }
    assert(bnl.isEmpty, "range join degenerated to BroadcastNestedLoopJoin")
  }
}
