package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** HTTP download source (SURVEY §2.1 S5 — `DownloadManager`,
  * src/Smartstore/Net/Http/DownloadManager.cs;
  * `EntityImporterBase.CreateDownloadItem(s)`): the reference pulls remote
  * files (product images by URL) into the import pipeline.
  *
  * Spark mapping per the survey: a driver-side fetch into a staging
  * directory, then a distributed `binaryFile` read — the relational core
  * never performs network I/O inside tasks. The fetch handles `file:`
  * URIs and real `http(s):` GETs (JDK HttpClient; non-2xx or network
  * failure marks the item failed, mirroring `DownloadManager`'s
  * per-item success flag at DownloadManager.cs:57 — a bad URL skips one
  * item, never the import). This container has no egress, so the spec
  * exercises the HTTP path against a loopback server; the binaryFile
  * scan is the distributed part either way. */
object Download {

  /** One JDK client for every driver-side HTTP path (Deploy shares it —
    * a config change must not be able to diverge between the two). */
  private[etl] lazy val http = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10))
    .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
    .build()

  /** Fetch a set of URIs into targetDir; returns (uri, localPath, ok). */
  def fetchAll(uris: Seq[String], targetDir: String): Seq[(String, String, Boolean)] = {
    val dir = Paths.get(targetDir)
    Files.createDirectories(dir)
    uris.map { u =>
      try {
        val src = java.net.URI.create(u)
        val name = Paths.get(src.getPath).getFileName.toString
        // staged name = FULL URI digest + original filename: two URLs
        // ending in the same segment (cdn/a/img.jpg, cdn/b/img.jpg — the
        // product-image case) must stage to DIFFERENT files, not silently
        // clobber each other while both report ok; a truncated digest
        // would birthday-collide at crawl scale
        val dst = dir.resolve(
          java.util.UUID.nameUUIDFromBytes(u.getBytes("UTF-8"))
            .toString + "-" + name)
        src.getScheme match {
          case "file" =>
            Files.copy(Paths.get(src.getPath), dst, StandardCopyOption.REPLACE_EXISTING)
          case "http" | "https" =>
            // streamed to disk (never buffered on the heap); TRUNCATE so a
            // re-fetch of a shorter body leaves no stale tail. ANY failure
            // — non-2xx, timeout, mid-transfer reset — must remove the
            // partial file, or readBinary over the staging dir would
            // ingest bytes whose item reported failed.
            try {
              val resp = http.send(
                java.net.http.HttpRequest.newBuilder(src)
                  .timeout(java.time.Duration.ofSeconds(30)).GET().build(),
                java.net.http.HttpResponse.BodyHandlers.ofFile(dst,
                  java.nio.file.StandardOpenOption.CREATE,
                  java.nio.file.StandardOpenOption.WRITE,
                  java.nio.file.StandardOpenOption.TRUNCATE_EXISTING))
              if (resp.statusCode / 100 != 2)
                throw new IllegalStateException(s"HTTP ${resp.statusCode} for $u")
            } catch { case e: Exception =>
              Files.deleteIfExists(dst)
              throw e
            }
          case other =>
            throw new IllegalArgumentException(s"unsupported scheme $other")
        }
        (u, dst.toString, true)
      } catch { case _: Exception => (u, "", false) }
    }
  }

  /** Distributed binary read of the staged files: (path, modificationTime,
    * length, content) rows — feed into multimodal/feature pipelines. */
  def readBinary(spark: SparkSession, stagedDir: String): DataFrame =
    spark.read.format("binaryFile").load(stagedDir)
}
