package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

/** merge_asof direction/tolerance semantics on hand-built data, including
  * the exact-distance tie (→ backward) the fixture never produces. */
class AsofDirectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture = {
    import spark.implicits._
    // right rows at ts 10 and 30; left at 5 (only forward), 20 (tie),
    // 12 (backward closer), 28 (forward closer), 40 (only backward)
    val left = Seq(("k", 5L), ("k", 12L), ("k", 20L), ("k", 28L), ("k", 40L)).toDF("k", "ts")
    val right = Seq(("k", 10L, 1.0), ("k", 30L, 3.0)).toDF("k", "ts", "v")
    (left, right)
  }

  private def out(direction: String, tolerance: Long = -1L): Map[Long, Option[Double]] = {
    val (l, r) = fixture
    AsofJoin
      .asof(l, r, "k", "ts", Seq("v"), "m_", direction, tolerance)
      .collect()
      .map(row => row.getLong(1) -> Option(row.get(2)).map(_.asInstanceOf[Double]))
      .toMap
  }

  test("backward picks the latest right at-or-before") {
    assert(out("backward") == Map(5L -> None, 12L -> Some(1.0), 20L -> Some(1.0), 28L -> Some(1.0), 40L -> Some(3.0)))
  }

  test("forward picks the earliest right at-or-after") {
    assert(out("forward") == Map(5L -> Some(1.0), 12L -> Some(3.0), 20L -> Some(3.0), 28L -> Some(3.0), 40L -> None))
  }

  test("nearest picks the closer side; exact tie goes backward") {
    // 12: back dist 2 vs fwd 18 → 1.0; 20: tie (10 vs 10) → backward 1.0;
    // 28: back 18 vs fwd 2 → 3.0; 5: only fwd; 40: only back
    assert(out("nearest") == Map(5L -> Some(1.0), 12L -> Some(1.0), 20L -> Some(1.0), 28L -> Some(3.0), 40L -> Some(3.0)))
  }

  test("tolerance nulls matches beyond the bound in every direction") {
    assert(out("backward", 5L) == Map(5L -> None, 12L -> Some(1.0), 20L -> None, 28L -> None, 40L -> None))
    assert(out("forward", 5L) == Map(5L -> Some(1.0), 12L -> None, 20L -> None, 28L -> Some(3.0), 40L -> None))
    assert(out("nearest", 5L) == Map(5L -> Some(1.0), 12L -> Some(1.0), 20L -> None, 28L -> Some(3.0), 40L -> None))
  }
}
