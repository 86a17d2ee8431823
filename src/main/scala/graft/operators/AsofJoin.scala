package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of join (SURVEY §2.E "joins"): align each left row to the most
  * recent right row with right.ts ≤ left.ts, per key — the canonical
  * trades⋈quotes / events⋈bars alignment the reference does implicitly
  * with pandas' index alignment (and pandas.merge_asof does explicitly).
  *
  * Spark-first shape: UNION the two sides tagged by origin, ONE window
  * pass per key ordered by (ts, origin) carrying the right payload with
  * `last(_, ignoreNulls)`, then filter back to left rows. Cost = one
  * shuffle on the key + one sort — no range-join explosion, no skew
  * amplification: at 100 TB this is the same exchange every indicator
  * already needs, and Catalyst reuses it when composed.
  *
  * Right-side ties (same key, same ts): the LATEST right row in input
  * order wins (deterministic because the right side is sorted by a
  * final tiebreak on its row order within ts via monotonically increasing
  * id is avoided — instead callers must ensure unique (key, ts) on the
  * right, which holds for bar/quote tables by construction).
  */
object AsofJoin {

  /** Left rows enriched with the as-of-latest right columns (null when no
    * right row precedes). `rightCols` are renamed with `prefix`. */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightCols: Seq[String],
      prefix: String = "r_"
  ): DataFrame = {
    require(rightCols.nonEmpty, "asof: rightCols must be non-empty")
    require(
      rightCols.forall(c => !left.columns.contains(s"$prefix$c")),
      s"asof: output name collision — left already has ${rightCols.map(prefix + _).filter(left.columns.contains).mkString(", ")}"
    )
    // collision-free internal names (a user column literally named "__side"
    // must survive the union/carry untouched)
    val taken = (left.columns ++ right.columns).toSet
    def fresh(base: String): String =
      Iterator.iterate(base)(_ + "_").dropWhile(taken.contains).next()
    val sideC = fresh("__side"); val pC = fresh("__p"); val pcC = fresh("__pc")
    val leftTagged = left.withColumn(sideC, lit(1))
    val rightTagged = right
      .select(col(keyCol) +: col(tsCol) +: rightCols.map(col): _*)
      .withColumn(sideC, lit(0))
    // align schemas: left keeps all its columns; right contributes its
    // payload as ONE struct so `last(ignoreNulls)` carries the whole latest
    // right ROW atomically — per-column carry would back-fill a NULL cell
    // from an older right row, mixing columns across rows (merge_asof
    // semantics are row-level, including genuine NULLs in the latest row).
    val payloadType = StructType(rightCols.map(c => StructField(c, right.schema(c).dataType)))
    val leftCols = left.columns
    val l2 = leftTagged.select(
      (leftCols.map(col) :+ col(sideC)) :+ lit(null).cast(payloadType).as(pC): _*
    )
    val r2 = rightTagged.select(
      (leftCols.map {
        case c0 if c0 == keyCol => col(keyCol)
        case c0 if c0 == tsCol => col(tsCol)
        case c0 => lit(null).cast(left.schema(c0).dataType).as(c0)
      }.toSeq :+ col(sideC)) :+ struct(rightCols.map(col): _*).as(pC): _*
    )
    val unioned = l2.unionByName(r2.select(l2.columns.map(col): _*))
    // right rows sort BEFORE left rows at equal ts (side 0 < 1): a bar
    // stamped at ts is visible to an event at the same ts
    val w = Window
      .partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col(sideC).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried =
      unioned.withColumn(pcC, last(col(pC), ignoreNulls = true).over(w))
    carried
      .where(col(sideC) === 1)
      .select(
        leftCols.map(col) ++
          rightCols.map(c => col(pcC).getField(c).as(s"$prefix$c")): _*
      )
  }
}
