package graft

import graft.queries.StrategyOhlcvQueries
import org.apache.spark.metrics.source.CodegenMetrics

/** Driver-side cost probe for strategy_ohlcv_batch (run via
  * tools/run_main.sh graft.OhlcvProbe [sfDir]). Splits build / plan / exec
  * per iteration and reads the global Janino CodegenMetrics before and
  * after each exec: if generatedClassCount / compilationTime keep growing
  * on warm iterations, the codegen cache is missing (or thrashing) and
  * every run pays full Janino compilation of the ~1000-expression plan.
  */
object OhlcvProbe {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    Graft.bars(spark, dir).count() // warm fixture
    def metrics(): (Long, Long, Long) = (
      CodegenMetrics.METRIC_COMPILATION_TIME.getCount,
      CodegenMetrics.METRIC_SOURCE_CODE_SIZE.getCount,
      CodegenMetrics.METRIC_GENERATED_METHOD_BYTECODE_SIZE.getCount
    )
    Seq(("true", "true"), ("true", "false"), ("true", "true"), ("true", "false")).zipWithIndex.foreach { case ((aqe, cp), i0) =>
      val i = i0 + 1
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.constraintPropagation.enabled", cp)
      val (c0, s0, m0) = metrics()
      val t0 = System.nanoTime()
      val df = StrategyOhlcvQueries.q.spark(spark, dir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      df.count()
      val t3 = System.nanoTime()
      val (c1, s1, m1) = metrics()
      println(
        f"iter $i (aqe=$aqe cp=$cp): build=${(t1 - t0) / 1e9}%.2fs plan=${(t2 - t1) / 1e9}%.2fs exec=${(t3 - t2) / 1e9}%.2fs " +
          f"compiles=${c1 - c0} srcUnits=${s1 - s0} methods=${m1 - m0} " +
          f"compileMs=${CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot.getMean / 1e6}%.1f(mean)"
      )
    }
    val df = StrategyOhlcvQueries.q.spark(spark, "/root/testdata/sf0.1")
    val pe = df.queryExecution.executedPlan
    val counts = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    pe.foreach(n => counts(n.nodeName) += 1)
    println("plan node counts: " + counts.toSeq.sortBy(-_._2).mkString(", "))
    println("total nodes: " + counts.values.sum)

    // stage-level timeline of one warm execution
    import org.apache.spark.scheduler._
    val stages = scala.collection.mutable.ArrayBuffer[(Int, Int, Long, Long, Long)]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val deser = si.taskMetrics.executorDeserializeTime
        stages += ((si.stageId, si.numTasks,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          deser, si.taskMetrics.executorRunTime))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val df2 = StrategyOhlcvQueries.q.spark(spark, "/root/testdata/sf0.1")
    df2.count()
    val t1 = System.nanoTime()
    Thread.sleep(1500) // let the listener bus drain

    // attribute driver-side build/plan cost to Catalyst rules
    org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
    val df3 = StrategyOhlcvQueries.q.spark(spark, "/root/testdata/sf0.1")
    df3.queryExecution.executedPlan
    println(
      org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent()
        .linesIterator.take(25).mkString("\n")
    )

    // split the build: strategy() vs the 100-col normd select vs orderBy
    {
      import org.apache.spark.sql.functions._
      import graft.ta.{prim => P, Strategy, registry}
      val sq = graft.queries.StrategyOhlcvQueries
      val bars = Graft.bars(spark, "/root/testdata/sf0.1")
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val st = registry.strategy(bars, Strategy("ohlcv_batch", sq.specs))
        val t1 = System.nanoTime()
        val sel = st.select(
          col("series_id") +: col("ts") +: sq.outs.map(o => P.normd(col(o).cast("double")).as(o)): _*
        )
        val t2 = System.nanoTime()
        val ord = sel.orderBy("series_id", "ts")
        val t3 = System.nanoTime()
        println(f"build split $i: strategy=${(t1 - t0) / 1e9}%.2fs select=${(t2 - t1) / 1e9}%.2fs orderBy=${(t3 - t2) / 1e9}%.2fs")
      }
    }
    println(f"warm count total=${(t1 - t0) / 1e9}%.2fs")
    stages.foreach { case (id, n, wall, deser, run) =>
      println(s"  stage $id: tasks=$n wall=${wall}ms deserSum=${deser}ms runSum=${run}ms")
    }
    spark.stop()
  }
}
