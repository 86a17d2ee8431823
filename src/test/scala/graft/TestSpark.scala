package graft

import org.apache.spark.sql.SparkSession

/** Shared session for all specs (local[4], one JVM per `sbt test` fork). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      // plan-shape assertions inspect static plans; AQE hides Exchanges
      // inside QueryStage leaves and adds nothing at this data size
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    Graft.init(s)
    s
  }

  val sfDir = "/root/testdata/sf0.001"
}
