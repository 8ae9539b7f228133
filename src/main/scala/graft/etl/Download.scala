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
  * never performs network I/O inside tasks. This container has no egress,
  * so the fetch supports `file:` URIs (and is the seam where an HTTP
  * client plugs in); the binaryFile scan is the real, distributed part. */
object Download {

  /** Fetch a set of URIs into targetDir; returns (uri, localPath, ok). */
  def fetchAll(uris: Seq[String], targetDir: String): Seq[(String, String, Boolean)] = {
    val dir = Paths.get(targetDir)
    Files.createDirectories(dir)
    uris.map { u =>
      try {
        val src = java.net.URI.create(u)
        require(src.getScheme == "file", s"no egress: unsupported scheme ${src.getScheme}")
        val name = Paths.get(src.getPath).getFileName.toString
        val dst = dir.resolve(name)
        Files.copy(Paths.get(src.getPath), dst, StandardCopyOption.REPLACE_EXISTING)
        (u, dst.toString, true)
      } catch { case e: Exception => (u, "", false) }
    }
  }

  /** Distributed binary read of the staged files: (path, modificationTime,
    * length, content) rows — feed into multimodal/feature pipelines. */
  def readBinary(spark: SparkSession, stagedDir: String): DataFrame =
    spark.read.format("binaryFile").load(stagedDir)
}
