package graft

import graft.operators.MediaSearch
import graft.operators.MediaSearch.{Filter, Query, SpecialFolder}
import org.scalatest.funsuite.AnyFunSuite

/** Media search battery semantics vs MediaSearcher.cs:26-300 — the
  * branches q135's oracle doesn't walk: term/exact/alt search, the tag
  * semi-join, special folders, and the default deleted gate. */
class MediaSearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (id, folder_id, name, alt, media_type, extension, mime_type,
  //  pixel_size, hidden, deleted, is_transient)
  private lazy val files = Seq(
    (1L, Some(1L), "banner.jpg", "hero banner", "image", "jpg", "image/jpeg", 40000L, false, false, false),
    (2L, Some(2L), "logo.png", "logo", "image", "png", "image/png", 60000L, false, false, false),
    (3L, Some(2L), "intro.mp4", "intro video", "video", "mp4", "video/mp4", 900000L, true, false, false),
    (4L, Some(3L), "old-banner.jpg", "banner", "image", "jpg", "image/jpeg", 1500000L, false, true, false),
    (5L, None, "orphan.pdf", null, "document", "pdf", "application/pdf", 0L, false, false, false),
    (6L, Some(1L), "tmp-upload.bin", null, "document", "bin", "application/octet-stream", 0L, false, false, true)
  ).map { case (id, fid, n, alt, mt, ext, mime, px, h, d, t) =>
    (id, fid.map(java.lang.Long.valueOf).orNull, n, alt, mt, ext, mime, px, h, d, t)
  }.toDF("id", "folder_id", "name", "alt", "media_type", "extension",
    "mime_type", "pixel_size", "hidden", "deleted", "is_transient")

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().toSeq

  test("wildcard term over name; includeAlt extends the OR; exact match narrows") {
    val wild = MediaSearch.prepareQuery(files,
      Query(filter = Filter(term = Some("*banner*"))))
    assert(ids(wild) == Seq(1L)) // 4 matches the name but is deleted
    val withAlt = MediaSearch.prepareQuery(files,
      Query(filter = Filter(term = Some("*banner*"), includeAlt = true)))
    assert(ids(withAlt) == Seq(1L)) // alt 'banner' on 4 still deleted-gated
    // exactMatch quotes the term: the match stays Contains (the
    // reference DSL's string default, RuleQueryableExtensions.cs:28-80)
    // but wildcards lose their meaning — '*banner*' is now the literal
    // seven-character string, which no name contains
    val exactWild = MediaSearch.prepareQuery(files,
      Query(filter = Filter(term = Some("*banner*"), exactMatch = true)))
    assert(ids(exactWild) == Seq.empty)
    val exact = MediaSearch.prepareQuery(files,
      Query(filter = Filter(term = Some("banner"), includeAlt = true,
        exactMatch = true)))
    assert(ids(exact) == Seq(1L)) // literal contains still hits banner.jpg
  }

  test("tag filter is an EXISTS semi-join over the bridge") {
    val tags = Seq((1L, 10L), (2L, 10L), (2L, 20L), (4L, 20L))
      .toDF("file_id", "tag_id")
    val got = MediaSearch.prepareQuery(files,
      Query(filter = Filter(tags = Seq(20L))), fileTags = Some(tags))
    assert(ids(got) == Seq(2L)) // 4 carries the tag but is deleted
    intercept[IllegalArgumentException] {
      MediaSearch.applyFilter(files, Filter(tags = Seq(20L)), None)
    }
  }

  test("special folders: Trash flips the deleted gate, AllFiles drops it") {
    assert(ids(MediaSearch.prepareQuery(files,
      Query(folderId = Some(SpecialFolder.Trash)))) == Seq(4L))
    assert(ids(MediaSearch.prepareQuery(files,
      Query(folderId = Some(SpecialFolder.AllFiles)))) == (1L to 6L))
    // an explicit filter verdict beats the special-folder default
    assert(ids(MediaSearch.prepareQuery(files,
      Query(folderId = Some(SpecialFolder.Trash),
        filter = Filter(deleted = Some(false))))) == Seq(1L, 2L, 3L, 5L, 6L))
  }

  test("special folders: Transient, Unassigned, Orphans") {
    assert(ids(MediaSearch.prepareQuery(files,
      Query(folderId = Some(SpecialFolder.TransientFiles)))) == Seq(6L))
    assert(ids(MediaSearch.prepareQuery(files,
      Query(folderId = Some(SpecialFolder.UnassignedFiles)))) == Seq(5L))
    val tracks = Seq(Tuple1(1L), Tuple1(3L)).toDF("file_id")
    // in a folder, not tracked, not deleted → orphan (2 and 6)
    assert(ids(MediaSearch.prepareQuery(files,
      Query(folderId = Some(SpecialFolder.Orphans)),
      tracks = Some(tracks))) == Seq(2L, 6L))
    intercept[IllegalArgumentException] {
      MediaSearch.prepareQuery(files, Query(folderId = Some(SpecialFolder.Orphans)))
    }
    intercept[IllegalArgumentException] {
      MediaSearch.prepareQuery(files, Query(folderId = Some(-42L)))
    }
  }

  test("media type / extension chains, hidden flag, dimension validation") {
    assert(ids(MediaSearch.prepareQuery(files,
      Query(filter = Filter(mediaTypes = Seq("image"))))) == Seq(1L, 2L))
    assert(ids(MediaSearch.prepareQuery(files,
      Query(filter = Filter(extensions = Seq("png", "mp4"),
        hidden = Some(false))))) == Seq(2L))
    intercept[IllegalArgumentException] {
      MediaSearch.prepareQuery(files,
        Query(filter = Filter(dimensions = Seq("Gigantic")))).collect()
    }
  }

  test("shallow vs deep folder scoping, sort ordering") {
    val folders = Seq(
      (1L, null.asInstanceOf[java.lang.Long], "root"),
      (2L, java.lang.Long.valueOf(1L), "sub"),
      (3L, java.lang.Long.valueOf(2L), "subsub"))
      .toDF("id", "parent_id", "name")
    val shallow = MediaSearch.prepareQuery(files, Query(folderId = Some(1L)))
    assert(ids(shallow) == Seq(1L, 6L))
    val deep = MediaSearch.prepareQuery(files,
      Query(folderId = Some(1L), deepSearch = true,
        sortBy = "pixel_size", sortDesc = true), folders = Some(folders))
    // folders 1,2,3 hold files 1,2,3,6 (3 hidden is still not deleted)
    assert(ids(deep) == Seq(3L, 2L, 1L, 6L)) // pixel_size desc, id tiebreak
    intercept[IllegalArgumentException] {
      MediaSearch.prepareQuery(files, Query(folderId = Some(1L), deepSearch = true))
    }
  }
}
