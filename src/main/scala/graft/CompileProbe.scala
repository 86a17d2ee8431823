package graft
import graft.ta.{Strategy, registry}
import graft.queries.Strategy50Queries
import org.apache.spark.sql.functions._
import graft.ta.{prim => P}

/** Driver-side compile-cost probe for the Strategy batch path (run via
  * tools/run_main.sh graft.CompileProbe). Splits build (DataFrame
  * construction = Catalyst analysis per withColumn) from plan
  * (optimize+physical) from exec, and contrasts the accumulated fold with
  * per-spec-over-base builds to show where the time goes. */
object CompileProbe {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session()
    val dir = "/root/testdata/sf0.01"
    val base = Graft.userSeries(spark, dir)
    base.count()
    registry.strategy(base, Strategy("b", Strategy50Queries.specs.take(3))).queryExecution.executedPlan
    // iter 1 = COLD build (first compilation of this (plan, strategy) key);
    // iters 2+ hit the compiled-plan memo (prepared-statement reuse)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val df = registry.strategy(base, Strategy("batch50", Strategy50Queries.specs))
      val t1 = System.nanoTime()
      val sel = df.select(col("series_id") +: col("ts") +: Strategy50Queries.outs.map(o => P.normd(col(o)).as(o)): _*)
      val pe = sel.queryExecution.executedPlan
      val t2 = System.nanoTime()
      sel.count()
      val t3 = System.nanoTime()
      val t4 = System.nanoTime()
      Strategy50Queries.specs.foreach(spec => registry(base, spec))
      val t5 = System.nanoTime()
      println(f"iter $i: build=${(t1-t0)/1e9}%.3f s, plan=${(t2-t1)/1e9}%.3f s, exec=${(t3-t2)/1e9}%.3f s, perSpecOverBase=${(t5-t4)/1e9}%.3f s")
    }
    // cold-build cost in isolation (fresh names defeat the memo): the
    // leveled compiler's true driver-side analysis price per build
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      registry.strategy(base, Strategy(s"cold_$i", Strategy50Queries.specs))
      val t1 = System.nanoTime()
      println(f"cold build $i: ${(t1 - t0) / 1e9}%.3f s")
    }
    // full-registry Strategy.All compile benchmark (every kind, default
    // params; includes the builder-fold tail for unlowerable specs)
    locally {
      val ohlcv = Graft.bars(spark, dir)
      ohlcv.count()
      val t0 = System.nanoTime()
      val all = registry.strategy(ohlcv, Strategy.All)
      val t1 = System.nanoTime()
      all.queryExecution.executedPlan
      val t2 = System.nanoTime()
      println(f"Strategy.All (${Strategy.All.ta.size} kinds): build=${(t1 - t0) / 1e9}%.3f s, plan=${(t2 - t1) / 1e9}%.3f s, cols=${all.columns.length}")
    }
    spark.stop()
  }
}
