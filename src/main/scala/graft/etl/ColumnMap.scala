package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-mapping layer (SURVEY §2.8 step 4 — `ColumnMap.cs:15-121`,
  * `ImportDataSegmenter.GetColumnIndexes`, ImportDataSegmenter.cs:185-208):
  * source→target renames, per-column defaults, ignored columns, and the
  * `Name[index]` convention for per-language/per-key variants, modeled as
  * one `MapType` column per base name (SURVEY §1.2).
  */
final case class ColumnMapping(
    renames: Map[String, String] = Map.empty,
    /** Default applied when the (string) cell is null — the reference's
      * per-column default values. */
    defaults: Map[String, String] = Map.empty,
    ignored: Set[String] = Set.empty)

object ColumnMap {

  private val Indexed = "^(.+)\\[(.+)\\]$".r

  /** `ColumnMap.ParseSourceName`: "Attr[Color]" → ("Attr", Some("Color")). */
  def parseSourceName(name: String): (String, Option[String]) = name match {
    case Indexed(base, idx) => (base, Some(idx))
    case other => (other, None)
  }

  def apply(df: DataFrame, mapping: ColumnMapping): DataFrame = {
    // 1. drop ignored
    var out = mapping.ignored.foldLeft(df)((d, c) =>
      if (d.columns.contains(c)) d.drop(c) else d)
    // 2. rename
    out = mapping.renames.foldLeft(out) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }
    // 3. defaults for null cells
    out = mapping.defaults.foldLeft(out) { case (d, (c, v)) =>
      if (d.columns.contains(c)) d.withColumn(c, coalesce(col(c), lit(v))) else d
    }
    // 4. fold indexed columns "Base[idx]" into a map column "base_map"
    val indexed = out.columns.toSeq.flatMap { c =>
      parseSourceName(c) match {
        case (base, Some(idx)) => Some((base, idx, c))
        case _ => None
      }
    }
    // group case-insensitively: 'Attr[Color]' and 'ATTR[Size]' both feed
    // attr_map — case-sensitive grouping would let the second group's
    // withColumn silently overwrite the first's entries
    indexed.groupBy(_._1.toLowerCase).foreach { case (base, cols) =>
      val entries = cols.flatMap { case (_, idx, c) => Seq(lit(idx), col(c)) }
      out = out.withColumn(s"${base}_map", map(entries: _*))
      cols.foreach { case (_, _, c) => out = out.drop(c) }
    }
    out
  }
}
