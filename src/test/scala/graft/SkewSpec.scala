package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

/** saltedJoin ≡ plain join on a deliberately skewed fixture (90% of the
  * big side on one key), for every supported join type; the physical plan
  * must shuffle on (key, salt), not key alone. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val big = spark
    .range(0, 10000)
    .select(
      when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"),
      col("id").as("payload")
    )
  // small side covers half the keys so left_outer/anti have real misses
  private lazy val small = spark
    .range(0, 50)
    .select(col("id").as("sk"), concat(lit("dim_"), col("id")).as("name"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  for (jt <- Seq("inner", "left_outer", "left_semi", "left_anti")) {
    test(s"salted $jt join equals the plain join on a 90%-hot-key fixture") {
      val plain = big.join(small, col("k") === col("sk"), jt)
      val salted = Skew.saltedJoin(big, small, Seq("k"), Seq("sk"), factor = 8, joinType = jt)
      assert(rows(salted) == rows(plain))
    }
  }

  test("the salted shuffle partitions on (key, salt)") {
    val salted = Skew.saltedJoin(big, small, Seq("k"), Seq("sk"), factor = 8)
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt_b"), s"salt column absent from physical plan:\n$plan")
  }

  for (jt <- Seq("inner", "left_outer", "left_semi", "left_anti")) {
    test(s"hot-key-only salted $jt join equals the plain join") {
      val plain = big.join(small, col("k") === col("sk"), jt)
      // threshold 100: only the 90% key is hot — both paths carry rows
      val hot = Skew.saltedJoinHot(big, small, Seq("k"), Seq("sk"), factor = 8, hotThreshold = 100, joinType = jt)
      assert(rows(hot) == rows(plain))
    }
  }

  test("hot-key salting with nothing hot degenerates to the plain join result") {
    val plain = big.join(small, col("k") === col("sk"), "inner")
    val none = Skew.saltedJoinHot(big, small, Seq("k"), Seq("sk"), 8, hotThreshold = Long.MaxValue)
    assert(rows(none) == rows(plain))
  }

  test("null big-side keys survive hot-key salting on outer joins") {
    val bigN = big.withColumn("k", when(col("payload") % 7 === 0, lit(null: java.lang.Long)).otherwise(col("k")))
    val plain = bigN.join(small, col("k") === col("sk"), "left_outer")
    val hot = Skew.saltedJoinHot(bigN, small, Seq("k"), Seq("sk"), 8, hotThreshold = 100, joinType = "left_outer")
    assert(rows(hot) == rows(plain))
  }

  test("caller-passed salt expression spreads fully-duplicated hot rows") {
    // every hot row IDENTICAL: the default full-row xxhash64 salt puts them
    // all in one bucket (documented caveat) — a key+unique-column salt
    // restores the spread and must stay row-identical to the plain join
    val dup = spark
      .range(0, 5000)
      .select(lit(7L).as("k"), lit("same").as("payload"), col("id").as("uid"))
    val plain = dup.join(small, col("k") === col("sk"), "inner")
    val salted = Skew.saltedJoin(
      dup, small, Seq("k"), Seq("sk"), factor = 8, joinType = "inner",
      salt = Some(xxhash64(col("k"), col("uid")))
    )
    assert(rows(salted) == rows(plain))
  }

  test("right/full joins are rejected, salt columns never leak") {
    intercept[IllegalArgumentException](
      Skew.saltedJoin(big, small, Seq("k"), Seq("sk"), 4, joinType = "full")
    )
    val out = Skew.saltedJoin(big, small, Seq("k"), Seq("sk"), 4)
    assert(!out.columns.exists(_.startsWith("__salt")))
  }
}
