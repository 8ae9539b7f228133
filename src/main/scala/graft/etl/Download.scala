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

  private lazy val http = java.net.http.HttpClient.newBuilder()
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
        // staged name = short URI digest + original filename: two URLs
        // ending in the same segment (cdn/a/img.jpg, cdn/b/img.jpg — the
        // product-image case) must stage to DIFFERENT files, not silently
        // clobber each other while both report ok
        val dst = dir.resolve(
          java.util.UUID.nameUUIDFromBytes(u.getBytes("UTF-8"))
            .toString.take(8) + "-" + name)
        src.getScheme match {
          case "file" =>
            Files.copy(Paths.get(src.getPath), dst, StandardCopyOption.REPLACE_EXISTING)
          case "http" | "https" =>
            val resp = http.send(
              java.net.http.HttpRequest.newBuilder(src)
                .timeout(java.time.Duration.ofSeconds(30)).GET().build(),
              // straight to disk — a large asset never buffers on the heap
              java.net.http.HttpResponse.BodyHandlers.ofFile(dst))
            if (resp.statusCode / 100 != 2) {
              // the handler wrote the ERROR body to dst — remove it, or
              // the staged dir would feed an error page into binaryFile
              Files.deleteIfExists(dst)
              throw new IllegalStateException(s"HTTP ${resp.statusCode} for $u")
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
