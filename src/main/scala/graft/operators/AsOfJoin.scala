package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: attach to each left row the most recent right
  * row with `rightTs <= leftTs` within the same partition key — the
  * point-in-time join training-data and feature pipelines need (events →
  * latest prior state). Not present in the reference (SURVEY §2.4 note);
  * added as a scale extension.
  *
  * Implementation is composition (preference order (a) in the build
  * mandate): tag both sides, union, and carry the last right timestamp
  * forward with a partitioned running window — O(n log n) in each
  * partition via one sort, NO range join or per-row probe. Both sides
  * shuffle once on the partition key; the window sort rides the same
  * partitioning. Right rows order before left rows at equal timestamps,
  * so ties match (`>=` semantics, like DuckDB's ASOF JOIN).
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side (its `valueCols` are attached)
    * @param partition equality key column (both sides)
    * @param leftTs    left event-time column
    * @param rightTs   right event-time column
    * @param valueCols right columns to carry (default: rightTs only)
    * Output: all left columns + `asof_<rightTs>` (+ carried values). */
  def asOf(left: DataFrame, right: DataFrame, partition: String,
      leftTs: String, rightTs: String, valueCols: Seq[String] = Seq.empty): DataFrame = {
    val carried = (rightTs +: valueCols).distinct
    val rightTagged = right.select(
      (col(partition) +: col(rightTs).as("__ts") +: lit(0).as("__side") +:
        carried.map(c => col(c).as(s"__r_$c"))): _*)
    val leftTagged = left.select(
      (left.columns.map(col).toSeq :+ col(leftTs).as("__ts") :+ lit(1).as("__side")) ++
        carried.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    // right rows (side 0) sort before left rows at equal __ts ⇒ ties attach
    val w = Window.partitionBy(col(partition))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val withCarried = carried.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    withCarried
      .filter(col("__side") === 1)
      .drop(("__ts" +: "__side" +: carried.map(c => s"__r_$c")): _*)
  }
}
