package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The opt-in count(DISTINCT) → KMV rewrite: off by default (bit-exact
  * plans untouched), exact below sketch capacity when on, bounded error
  * above it, null exclusion preserved. */
class ApproxDistinctSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withFlag[T](k: Int)(f: => T): T = {
    spark.conf.set("spark.graft.approxDistinct", "true")
    spark.conf.set("spark.graft.approxDistinct.k", k.toString)
    try f
    finally {
      spark.conf.set("spark.graft.approxDistinct", "false")
    }
  }

  test("flag off: plans and results are untouched") {
    val df = spark.range(0, 1000).select((col("id") % 100).as("x"))
    val q = df.agg(countDistinct(col("x")))
    assert(q.head().getLong(0) == 100L)
    assert(!q.queryExecution.optimizedPlan.toString.contains("graft_kmv"))
  }

  test("flag on: the optimized plan swaps Count(distinct) for the sketch") {
    withFlag(1024) {
      val df = spark.range(0, 1000).select((col("id") % 100).as("x"))
      val q = df.agg(countDistinct(col("x")))
      val plan = q.queryExecution.optimizedPlan
      assert(plan.toString.contains("graft_kmv"), s"rewrite did not fire:\n$plan")
      // the output ALIAS keeps the name count(DISTINCT x); what must be
      // gone is the Count aggregate function itself
      val counts = plan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
          a.aggregateExpressions.flatMap(_.collect {
            case e: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
                if e.aggregateFunction.isInstanceOf[org.apache.spark.sql.catalyst.expressions.aggregate.Count] =>
              e
          })
      }.flatten
      assert(counts.isEmpty, s"Count survived:\n$plan")
    }
  }

  test("below capacity the estimate is the exact count (grouped + global)") {
    withFlag(4096) {
      val df = spark
        .range(0, 10000)
        .select((col("id") % 4).as("g"), (col("id") % 500).as("x"))
      val global = df.agg(countDistinct(col("x"))).head().getLong(0)
      assert(math.abs(global - 500L) <= 1, s"got $global") // ±1 for a mod-P hash collision
      val grouped = df
        .groupBy("g")
        .agg(countDistinct(col("x")).as("d"))
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      // each residue class g hits 125 distinct x values
      grouped.values.foreach(v => assert(math.abs(v - 125L) <= 1, s"got $grouped"))
    }
  }

  test("above capacity the estimate lands within 3/sqrt(k)") {
    val k = 256
    withFlag(k) {
      val n = 40000
      val df = spark.range(0, n.toLong * 2).select((col("id") % n).as("x"))
      val est = df.agg(countDistinct(col("x"))).head().getLong(0).toDouble
      val rel = math.abs(est - n) / n.toDouble
      assert(rel < 3.0 / math.sqrt(k.toDouble), s"rel err $rel (est $est)")
    }
  }

  test("null rows stay excluded, multi-arg tuples hash as tuples") {
    withFlag(1024) {
      val df = Seq[(java.lang.Long, String)](
        (1L, "a"),
        (1L, "a"),
        (2L, "b"),
        (null, "c"),
        (3L, null)
      ).toDF("x", "y")
      assert(df.agg(countDistinct(col("x"))).head().getLong(0) == 3L)
      // count(DISTINCT x, y) drops rows with ANY null member
      assert(df.agg(countDistinct(col("x"), col("y"))).head().getLong(0) == 2L)
    }
  }

  test("SQL route through the session extension config also rewrites") {
    withFlag(1024) {
      spark.range(0, 100).select((col("id") % 10).as("x")).createOrReplaceTempView("adr_t")
      val q = spark.sql("SELECT count(DISTINCT x) FROM adr_t")
      assert(q.head().getLong(0) == 10L)
      assert(q.queryExecution.optimizedPlan.toString.contains("graft_kmv"))
    }
  }
}
