package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-column data profiling — the pre-import inspection step of an ETL
  * pipeline (null rates, cardinalities, value ranges per column).
  *
  * ONE aggregation pass computes every column's stats (Spark plans the
  * multiple exact count-distincts as one expanded aggregate), and the
  * single result row is exploded to long form in-memory — NOT one
  * aggregation per column (which would rescan the table N times).
  * At 100 TB swap `countDistinct` for `approx_count_distinct` (HLL):
  * same plan shape, bounded state. */
object Profiler {

  /** Long-form profile: one row per column with non-null count, exact
    * distinct count, and min/max rendered as strings (cast AFTER the
    * typed min/max — lexicographic min of a numeric column is wrong). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // backticks: a profiled column named 'a.b' must not resolve as
    // struct-field access on the derived '<name>__nn' aggregate aliases
    def ref(name: String) = col(s"`$name`")
    val aggs = cols.flatMap { c =>
      Seq(
        count(ref(c)).as(s"${c}__nn"),
        countDistinct(ref(c)).as(s"${c}__nd"),
        min(ref(c)).cast("string").as(s"${c}__min"),
        max(ref(c)).cast("string").as(s"${c}__max"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        ref(s"${c}__nn").as("n_nonnull"),
        ref(s"${c}__nd").as("n_distinct"),
        ref(s"${c}__min").as("min_value"),
        ref(s"${c}__max").as("max_value"))): _*)).as("s"))
      .select(col("s.*"))
  }
}
