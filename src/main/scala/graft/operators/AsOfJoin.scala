package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: attach to each left row the nearest right row
  * in time within the same partition key — the point-in-time join
  * training-data and feature pipelines need (events → latest prior
  * state). Not present in the reference (SURVEY §2.4 note); added as a
  * scale extension.
  *
  * Directions (pandas merge_asof surface):
  *  - "backward" (default): most recent right with rightTs <= leftTs
  *  - "forward": earliest right with rightTs >= leftTs
  *  - "nearest": whichever of the two is closer (tie → backward)
  * `toleranceMs` (optional) null-outs a match farther than the tolerance
  * from the left timestamp — merge_asof's no-match semantics.
  *
  * Implementation is composition (preference order (a) in the build
  * mandate): tag both sides, union, and carry the adjacent right row's
  * values with a partitioned running window — O(n log n) in each
  * partition via one sort, NO range join or per-row probe. Both sides
  * shuffle once on the partition key; the window sorts ride the same
  * partitioning (forward adds a second sort order, not a shuffle). At
  * equal timestamps the right row matches in BOTH directions (`<=`/`>=`
  * inclusive ties, like DuckDB's ASOF JOIN).
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
      leftTs: String, rightTs: String, valueCols: Seq[String] = Seq.empty,
      direction: String = "backward",
      toleranceMs: Option[Long] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val carried = (rightTs +: valueCols).distinct
    val rightTagged = right.select(
      (col(partition) +: col(rightTs).as("__ts") +: lit(0).as("__side") +:
        carried.map(c => col(c).as(s"__r_$c"))): _*)
    val leftTagged = left.select(
      (left.columns.map(col).toSeq :+ col(leftTs).as("__ts") :+ lit(1).as("__side")) ++
        carried.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)

    // backward: right rows (side 0) sort before left at equal __ts and the
    // frame ends at the current row ⇒ ties attach. forward mirrors it:
    // rights sort after lefts and the frame starts at the current row.
    val wB = Window.partitionBy(col(partition))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wF = Window.partitionBy(col(partition))
      .orderBy(col("__ts"), lit(1) - col("__side"))
      .rowsBetween(0, Window.unboundedFollowing)

    def attach(df: DataFrame, prefix: String, w: org.apache.spark.sql.expressions.WindowSpec,
        pick: (Column => Column)): DataFrame =
      carried.foldLeft(df) { (d, c) =>
        d.withColumn(s"$prefix$c", pick(col(s"__r_$c")).over(w))
      }

    val withDirs = direction match {
      case "backward" => attach(unioned, "__b_", wB, last(_, ignoreNulls = true))
      case "forward" => attach(unioned, "__f_", wF, first(_, ignoreNulls = true))
      case "nearest" =>
        attach(attach(unioned, "__b_", wB, last(_, ignoreNulls = true)),
          "__f_", wF, first(_, ignoreNulls = true))
    }

    // gaps in micros (a long cast of a timestamp truncates to seconds)
    def gapB = unix_micros(col("__ts")) - unix_micros(col(s"__b_$rightTs"))
    def gapF = unix_micros(col(s"__f_$rightTs")) - unix_micros(col("__ts"))
    def inTol(gap: Column): Column =
      toleranceMs.map(t => gap <= t * 1000L).getOrElse(lit(true))

    // per carried column: select the direction's value, null when the
    // match is missing or out of tolerance
    val finalCols: Seq[Column] = carried.map { c =>
      val out = direction match {
        case "backward" =>
          when(col(s"__b_$rightTs").isNotNull && inTol(gapB), col(s"__b_$c"))
        case "forward" =>
          when(col(s"__f_$rightTs").isNotNull && inTol(gapF), col(s"__f_$c"))
        case "nearest" =>
          val bOk = col(s"__b_$rightTs").isNotNull && inTol(gapB)
          val fOk = col(s"__f_$rightTs").isNotNull && inTol(gapF)
          when(bOk && (!fOk || gapB <= gapF), col(s"__b_$c"))
            .when(fOk, col(s"__f_$c"))
      }
      out.as(s"asof_$c")
    }

    withDirs
      .filter(col("__side") === 1)
      .select(left.columns.map(col).toSeq ++ finalCols: _*)
  }
}
