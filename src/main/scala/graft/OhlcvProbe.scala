package graft

import graft.queries.StrategyOhlcvQueries
import org.apache.spark.metrics.source.CodegenMetrics

/** Driver-side cost probe for strategy_ohlcv_batch (run via
  * tools/run_main.sh graft.OhlcvProbe [sfDir]). Splits build / plan / exec
  * per iteration and reads the global Janino CodegenMetrics around each
  * exec: non-zero compiles on a WARM iteration means the codegen cache is
  * missing (the round-3 failure mode — 244 classes vs the default
  * 100-entry cache) and every run repays full compilation of the
  * ~1000-expression plan. Also prints the executed-plan node census and a
  * stage-level timeline of one warm run (wall vs task-deserialize vs
  * task-run sums — the residual warm cost is per-task codegen SOURCE
  * generation for the 14 Window + 25 Project operators, which Spark
  * regenerates per partition by design; Janino compilation is cached).
  */
object OhlcvProbe {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    Graft.bars(spark, dir).count() // warm fixture
    def compiles(): Long = CodegenMetrics.METRIC_SOURCE_CODE_SIZE.getCount
    (1 to 4).foreach { i =>
      val c0 = compiles()
      val t0 = System.nanoTime()
      val df = StrategyOhlcvQueries.q.spark(spark, dir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      df.count()
      val t3 = System.nanoTime()
      println(
        f"iter $i: build=${(t1 - t0) / 1e9}%.2fs plan=${(t2 - t1) / 1e9}%.2fs " +
          f"exec=${(t3 - t2) / 1e9}%.2fs compiles=${compiles() - c0}"
      )
    }

    val pe = StrategyOhlcvQueries.q.spark(spark, dir).queryExecution.executedPlan
    val counts = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    pe.foreach(n => counts(n.nodeName) += 1)
    println("plan node counts: " + counts.toSeq.sortBy(-_._2).mkString(", "))

    import org.apache.spark.scheduler._
    val stages = scala.collection.mutable.ArrayBuffer[(Int, Int, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages += ((si.stageId, si.numTasks,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.taskMetrics.executorDeserializeTime, si.taskMetrics.executorRunTime))
      }
    })
    val t0 = System.nanoTime()
    StrategyOhlcvQueries.q.spark(spark, dir).count()
    println(f"warm count total=${(System.nanoTime() - t0) / 1e9}%.2fs")
    Thread.sleep(1500) // let the listener bus drain
    stages.foreach { case (id, n, wall, deser, run) =>
      println(s"  stage $id: tasks=$n wall=${wall}ms deserSum=${deser}ms runSum=${run}ms")
    }
    spark.stop()
  }
}
