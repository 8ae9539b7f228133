package graft.operators

import graft.rules.{FilterExpr, FilterParser}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Media search filter battery (SURVEY §2.3 F2 inventory — `MediaSearcher`
  * `PrepareQuery`/`ApplyFilterQuery`/`ApplySearchTerm`,
  * src/Smartstore.Core/Content/Media/Search/MediaSearcher.cs:26-300) over
  * a media-file frame with the entity's column shape: id, folder_id
  * (nullable), name, alt, media_type, extension, mime_type, pixel_size,
  * hidden, deleted, is_transient.
  *
  * Same predicate vocabulary as the product-side F2 family, composed the
  * way the media dispatcher does:
  *  - FOLDER dispatch (PrepareQuery): a positive folder id scopes to the
  *    folder, or to its whole SUBTREE under deep search (the flattened
  *    tree semi-join — `GetNodesFlattened`); negative ids are the
  *    special folders (AllFiles/Trash/Orphans/TransientFiles/
  *    UnassignedFiles, IMediaService.cs:26-33);
  *  - the DEFAULT deleted=false gate applies only when neither the
  *    filter nor a special folder decided deletion state;
  *  - TERM search routes through the F5 filter-DSL across name (+alt),
  *    exact match via the DSL's quoted form — exactly `ApplySearchTerm`'s
  *    delegation to `ApplySearchFilter`;
  *  - MediaType/Extension/MimeType IN chains, the tag EXISTS semi-join,
  *    and the image-dimension OR-chain over pixel-size buckets
  *    (`ImageDimension` bounds).
  *
  * Scale shape: everything except the two semi-joins is a map-side
  * predicate on the scan; the folder subtree and tag frames are
  * dimension-sized and broadcast. */
object MediaSearch {

  /** `SpecialMediaFolder` (IMediaService.cs:26-33). */
  object SpecialFolder {
    val AllFiles = -500L
    val Trash = -400L
    val Orphans = -300L
    val TransientFiles = -200L
    val UnassignedFiles = -100L
  }

  /** `MediaFilesFilter`. */
  final case class Filter(
      term: Option[String] = None,
      includeAlt: Boolean = false,
      exactMatch: Boolean = false,
      mediaTypes: Seq[String] = Seq.empty,
      extensions: Seq[String] = Seq.empty,
      mimeTypes: Seq[String] = Seq.empty,
      tags: Seq[Long] = Seq.empty,
      /** ImageDimension names: VerySmall/Small/Medium/Large/VeryLarge. */
      dimensions: Seq[String] = Seq.empty,
      deleted: Option[Boolean] = None,
      hidden: Option[Boolean] = None)

  /** `MediaSearchQuery`: filter + folder dispatch + ordering. */
  final case class Query(
      folderId: Option[Long] = None,
      deepSearch: Boolean = false,
      filter: Filter = Filter(),
      sortBy: String = "id",
      sortDesc: Boolean = false)

  /** `ImageDimension` pixel-size buckets (MediaSearcher.cs:160-172):
    * (exclusive lower, inclusive upper]. */
  private val dimensionBounds: Map[String, (Long, Long)] = Map(
    "VerySmall" -> (0L, 50000L),
    "Small"     -> (50000L, 250000L),
    "Medium"    -> (250000L, 1000000L),
    "Large"     -> (1000000L, 2000000L),
    "VeryLarge" -> (2000000L, Long.MaxValue))

  /** `ApplyFilterQuery`: every filter the battery knows, ANDed. */
  def applyFilter(files: DataFrame, f: Filter,
      fileTags: Option[DataFrame] = None): DataFrame = {
    var q = files
    // Term → F5 DSL across name (+alt), OR-combined; '*' alone means all
    f.term.filter(t => t.nonEmpty && t != "*").foreach { t0 =>
      // exact match wraps in the DSL's quoted (equality) form
      val t = if (f.exactMatch) "\"" + t0.stripPrefix("\"").stripSuffix("\"") + "\"" else t0
      val members = ("name", true) +: (if (f.includeAlt) Seq(("alt", true)) else Nil)
      q = q.filter(FilterExpr.compile(FilterParser.parseForMembers(t, members), q.col))
    }
    // the three IN chains (a 1-element list is the equality fast path in
    // the reference; both compile to the same predicate here)
    if (f.mediaTypes.nonEmpty)
      q = q.filter(col("media_type").isin(f.mediaTypes.map(x => x: Any): _*))
    if (f.extensions.nonEmpty)
      q = q.filter(col("extension").isin(f.extensions.map(x => x: Any): _*))
    if (f.mimeTypes.nonEmpty)
      q = q.filter(col("mime_type").isin(f.mimeTypes.map(x => x: Any): _*))
    // Tags: EXISTS over the (file_id, tag_id) bridge
    if (f.tags.nonEmpty) {
      val bridge = fileTags.getOrElse(throw new IllegalArgumentException(
        "tag filter requires the fileTags bridge frame"))
      val wanted = broadcast(
        bridge.filter(col("tag_id").isin(f.tags.map(x => x: Any): _*))
          .select(col("file_id")).distinct())
      q = q.join(wanted, q("id") === wanted("file_id"), "left_semi")
    }
    // Image dimensions: OR across the selected buckets (ordered+distinct
    // like the reference's predicate list)
    if (f.dimensions.nonEmpty) {
      val preds = f.dimensions.distinct.sorted.map { d =>
        val (lo, hi) = dimensionBounds.getOrElse(d,
          throw new IllegalArgumentException(s"unknown image dimension '$d'"))
        col("pixel_size") > lo && col("pixel_size") <= hi
      }
      q = q.filter(preds.reduce(_ || _))
    }
    f.deleted.foreach(v => q = q.filter(col("deleted") === v))
    f.hidden.foreach(v => q = q.filter(col("hidden") === v))
    q
  }

  /** `PrepareQuery`: folder dispatch → filter battery → default deleted
    * gate → ordering.
    *
    * @param folders adjacency frame (id, parent_id, name) for subtree
    *                scoping — required for deep search;
    * @param tracks  (file_id) frame of tracked usages — required for the
    *                Orphans special folder (untrackable-folder awareness
    *                has no analog here: every folder is trackable). */
  def prepareQuery(files: DataFrame, q: Query,
      folders: Option[DataFrame] = None,
      fileTags: Option[DataFrame] = None,
      tracks: Option[DataFrame] = None): DataFrame = {
    var out = files
    // None = leave deletion to the filter/default; Some = special-folder verdict
    var deletedDefault: Option[Boolean] = Some(false)
    q.folderId match {
      case Some(fid) if fid > 0 =>
        if (q.deepSearch) {
          val tree = folders.getOrElse(throw new IllegalArgumentException(
            "deep folder search requires the folders frame"))
          val flat = Hierarchy.flatten(tree)
          val root = flat.filter(col("id") === fid)
            .select(col("path").as("__root"))
          val ids = flat.crossJoin(broadcast(root))
            .filter(col("path") === col("__root") ||
              col("path").startsWith(concat(col("__root"), lit("/"))))
            .select(col("id").as("__fid"))
          out = out.join(broadcast(ids),
            out("folder_id") === col("__fid"), "left_semi")
        } else out = out.filter(col("folder_id") === fid)
      case Some(SpecialFolder.AllFiles) => deletedDefault = None
      case Some(SpecialFolder.Trash)    => deletedDefault = Some(true)
      case Some(SpecialFolder.Orphans) =>
        val tracked = tracks.getOrElse(throw new IllegalArgumentException(
          "the Orphans folder requires the tracks frame"))
        out = out.filter(col("folder_id") > 0)
          .join(broadcast(tracked.select(col("file_id")).distinct()),
            out("id") === col("file_id"), "left_anti")
      case Some(SpecialFolder.TransientFiles) =>
        out = out.filter(col("is_transient"))
      case Some(SpecialFolder.UnassignedFiles) =>
        out = out.filter(col("folder_id").isNull)
      case Some(other) if other < 0 =>
        throw new IllegalArgumentException(s"unknown special folder $other")
      case _ => () // unscoped: all folders
    }
    out = applyFilter(out, q.filter, fileTags)
    // the default deleted gate fires only when the filter didn't decide
    if (q.filter.deleted.isEmpty)
      deletedDefault.foreach(v => out = out.filter(col("deleted") === v))
    val sortCol = if (q.sortDesc) col(q.sortBy).desc else col(q.sortBy).asc
    out.orderBy(sortCol, col("id"))
  }
}
