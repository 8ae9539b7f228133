package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history builder — the warehouse-side
  * twin of the K5 upsert loader (`Upsert`): where upsert keeps ONLY the
  * latest version of each entity (the reference's import semantics,
  * `EntityImporter` overwrite), SCD2 keeps EVERY version as a validity
  * interval, the shape a 100-TB warehouse uses to answer "what did this
  * dimension row look like when that fact happened" (and exactly what the
  * as-of join family q57/q91–q100 consumes as its right side).
  *
  * From a change log (key, attr, ts, tie) it emits one row per version:
  * consecutive duplicate attr values collapse (no version inflation),
  * `valid_from`/`valid_to` are adjacent-version timestamps (half-open,
  * NULL to = current), re-occurrences re-open a new version (A,B,A = 3
  * versions).
  *
  * Scale shape: both window passes partition by the dimension key —
  * ONE key-shuffle total (the collapse filter preserves the first
  * window's partitioning, so the second pass plans without a new
  * Exchange); per-partition work is bounded by versions-per-entity,
  * never corpus size. Null-safe change detection (`<=>`) so a NULL
  * attribute run collapses instead of dropping. */
object Scd {

  def type2(changeLog: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val key: Column = col(keyCol)
    val w = Window.partitionBy(key).orderBy(col(tsCol), col(tieCol))
    // the first row is detected explicitly (row_number), NOT via lag
    // returning NULL — a change log whose FIRST attr value is NULL would
    // otherwise be indistinguishable from "unchanged" and lose its
    // opening version (caught by ScdSpec's NULL-run case)
    val changes = changeLog
      .select(key, col(attrCol), col(tsCol), col(tieCol))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(attrCol)))
    changes
      .withColumn("version", row_number().over(w))
      .withColumn("__to", lead(col(tsCol), 1).over(w))
      .select(key,
        col("version").cast("int").as("version"),
        col(attrCol).as("attr"),
        unix_micros(col(tsCol)).as("valid_from_us"),
        unix_micros(col("__to")).as("valid_to_us"),
        when(col("__to").isNull, 1).otherwise(0).cast("int").as("is_current"))
  }
}
