package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Time-grid resampling with carry-forward fill — the gap-filling pass
  * of time-series analytics (irregular observations → a regular grid,
  * each grid point carrying the last observation at-or-before it).
  *
  * Composition, not a new primitive: the grid is a per-key
  * `sequence(floor(min), max, step)` explode (narrow, bounded by each
  * key's own span — no key sees another key's range, and an
  * all-history global spine is never materialized), and the fill is the
  * as-of join the engine already has (`AsOfJoin.asOf`, backward). At
  * 100 TB the grid is |keys| × span/step rows — usually far smaller
  * than the observation table — and the as-of shuffles both sides once
  * on the key.
  */
object Resample {

  /** Daily carry-forward resample: one row per (key, day) from the key's
    * first observation day to its last observation instant, with the
    * latest value at-or-before that day's 00:00.
    *
    * @param valueCols observation columns to carry (emitted as
    *                  `asof_<name>`, null before the first observation —
    *                  the leading edge has nothing to carry). */
  def dailyCarryForward(obs: DataFrame, key: String, tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    val bounds = obs
      .filter(col(key).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(key))
      .agg(date_trunc("day", min(col(tsCol))).as("__lo"), max(col(tsCol)).as("__hi"))
    val grid = bounds.select(col(key),
      explode(sequence(col("__lo"), col("__hi"), expr("interval 1 day")))
        .as("grid_ts"))
    AsOfJoin.asOf(grid, obs.select((key +: tsCol +: valueCols).distinct.map(col): _*),
      key, "grid_ts", tsCol, valueCols)
  }
}
