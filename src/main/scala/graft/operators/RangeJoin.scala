package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: all (left, right) pairs with the same key and
  * rightTs ∈ [leftTs − lower, leftTs + upper] — the "events within Δ of
  * each other" primitive (reference semantics: pandas merge_asof
  * tolerance / interval self-joins).
  *
  * Spark-first shape: a raw inequality condition plans as
  * BroadcastNestedLoopJoin — O(|L|·|R|) per key and a driver OOM at any
  * real scale. Instead the range is discretized into W-wide bins
  * (W = range length): the left side explodes to the ≤ 2 candidate bins
  * its window can overlap, the join is a plain hash EQUI-join on
  * (key, bin) — partitioned, spillable, AQE-skew-splittable — and the
  * exact range predicate filters the candidates. Each (l, r) pair meets
  * in exactly ONE bin (r's bin is a function of rightTs alone), so no
  * dedup pass is needed. Shuffle volume: 2·|L| + |R| rows.
  */
object RangeJoin {

  /** @param lower  inclusive lower offset: rightTs ≥ leftTs − lower
    * @param upper  inclusive upper offset: rightTs ≤ leftTs + upper
    *               (negative ⇒ strictly-before windows, e.g. upper = −1
    *               for "the preceding `lower` time units")
    * @param rightPrefix prefix for right-side payload columns
    */
  def within(
      left: DataFrame,
      right: DataFrame,
      key: String,
      tsCol: String,
      lower: Long,
      upper: Long,
      rightPrefix: String = "r_"
  ): DataFrame = {
    val w = math.max(lower + upper + 1L, 1L) // window length in ts units
    // integer DIV, not floor(double): epoch-nanos longs exceed 2^53 and a
    // double-rounded bin boundary silently drops boundary pairs
    val l = left
      .select(
        col(key).as("__k"),
        col(tsCol).as("__lts"),
        struct(left.columns.map(col): _*).as("__lrow")
      )
      .withColumn(
        "__bins",
        array_distinct(
          array(expr(s"(__lts - ${lower}L) DIV ${w}L"), expr(s"(__lts + ${upper}L) DIV ${w}L"))
        )
      )
    val lx = l.select(col("__k"), col("__lts"), col("__lrow"), explode(col("__bins")).as("__bin"))
    val r = right
      .select(
        col(key).as("__k"),
        col(tsCol).as("__rts"),
        struct(right.columns.map(col): _*).as("__rrow")
      )
      .withColumn("__bin", expr(s"__rts DIV ${w}L"))
    val joined = lx
      .join(r, Seq("__k", "__bin"))
      .where(col("__rts") >= col("__lts") - lower && col("__rts") <= col("__lts") + upper)
    val leftCols = left.columns.map(c => col(s"__lrow.$c").as(c))
    val rightCols = right.columns.filterNot(_ == key).map(c => col(s"__rrow.$c").as(s"$rightPrefix$c"))
    joined.select(leftCols ++ rightCols: _*)
  }
}
