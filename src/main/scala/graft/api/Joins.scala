package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators Spark lacks as built-ins, composed scale-safely from
  * the operators it has. */
object Joins {

  /** Left as-of join: for every left row, the value columns of the
    * latest right row with `right.tsCol <= left.tsCol` for the same
    * key (ASOF >= semantics — an exact-tie right row IS visible).
    *
    * Built as union + one keyed window with last-non-null carry-forward
    * — ONE shuffle on the key, no range explode, no per-row backward
    * scan, no broadcast: both sides may be corpus-sized. This is the
    * shape that survives 100 TB; engines with a native ASOF JOIN
    * (DuckDB oracles q55) plan it the same way.
    *
    * Output: all left columns plus `right`'s value columns (null where
    * no prior right row exists). Right value column names must not
    * collide with left column names. If `right` can hold several rows
    * per (key, ts), dedupe it first — which of the tied rows wins is
    * otherwise unspecified.
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
           tsCol: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightVals = right.columns.toSeq.filterNot(c => c == keyCol || c == tsCol)
    require(rightVals.nonEmpty, "right side needs at least one value column")
    require(rightVals.intersect(leftCols).isEmpty,
      s"right value columns ${rightVals.mkString(",")} must not collide with left columns")
    // align schemas: each side carries nulls for the other side's columns
    val leftTagged = rightVals.foldLeft(left)((df, c) =>
      df.withColumn(c, lit(null).cast(right.schema(c).dataType)))
      .withColumn("__side", lit(1))
    val rightTagged = leftCols.filterNot(c => c == keyCol || c == tsCol)
      .foldLeft(right)((df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .withColumn("__side", lit(0))
    // right rows sort before left rows at the same ts (0 < 1), so an
    // exact-tie right row is visible to the left row — ASOF >= semantics
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightVals.foldLeft(leftTagged.unionByName(rightTagged))(
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    filled.filter(col("__side") === 1)
      .select((leftCols ++ rightVals).map(col): _*)
  }

  /** Banded range join of a fact frame against a SMALL bands dimension
    * (lo ≤ value < hi): broadcast-nested-loop with the tiny side
    * broadcast — each fact row scans a handful of in-memory bands, the
    * fact table never shuffles. For two LARGE range sides, bucket the
    * range key and equi-join on the bucket instead. */
  def bandedRange(facts: DataFrame, bands: DataFrame, valueCol: String,
                  loCol: String = "lo", hiCol: String = "hi"): DataFrame =
    facts.join(broadcast(bands),
      col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
}
