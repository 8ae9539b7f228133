package graft.etl

import java.io.{BufferedInputStream, BufferedOutputStream, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.zip.{ZipEntry, ZipOutputStream}
import scala.jdk.CollectionConverters._

/** Driver-side deployment of produced export files (SURVEY §2.2 K4 —
  * `Export/Deployment/{FtpFilePublisher,HttpFilePublisher,
  * EmailFilePublisher,PublicFolderPublisher}.cs`; zip + file naming:
  * `ExportProfile.CreateZipArchive/FileNamePattern`, ExportProfile.cs:55,142).
  *
  * Deployment is post-processing outside the relational engine (the
  * reference runs it after the export writes files); kept as a thin util:
  * local-folder publishing, zip archiving, and HTTP publishing are
  * implemented (the HTTP path is loopback-tested — no egress here);
  * FTP/email transports stay out, as no offline server exists to drive
  * them against, and a production deployment plugs those clients in. */
object Deploy {

  /** Publisher seam (IFilePublisher analog). */
  trait Publisher { def publish(files: Seq[Path]): Unit }

  /** PublicFolderPublisher analog: copy produced files to a target dir. */
  final class FolderPublisher(targetDir: String) extends Publisher {
    override def publish(files: Seq[Path]): Unit = {
      val dir = Paths.get(targetDir)
      Files.createDirectories(dir)
      files.foreach(f => Files.copy(f, dir.resolve(f.getFileName.toString),
        StandardCopyOption.REPLACE_EXISTING))
    }
  }

  /** HttpFilePublisher analog (HttpFilePublisher.cs:37-80): POST the
    * produced files to an endpoint — either ONE multipart/form-data
    * request carrying every file (field names "file 1".."file N" with the
    * original filenames, the reference's MultipartFormDataPost mode) or
    * one plain POST per file (SimplePost). A missing scheme defaults to
    * http://, and a non-2xx response fails the deployment (the reference
    * records the HTTP status as the deployment error). Tested against a
    * loopback server (no egress in this container); FTP/email transports
    * remain out — no offline server exists to drive them against. */
  final class HttpPublisher(url: String, multipart: Boolean = true)
      extends Publisher {
    private val target = java.net.URI.create(
      if (url.matches("(?i)^https?://.*")) url else s"http://$url")

    /** RFC 2183-safe filename token: quotes/CR/LF in a name (the pattern
      * expansion substitutes user-supplied %profile% text) must not be
      * able to break part framing or inject fake boundaries. */
    private def safeName(n: String): String =
      n.replace("\\", "\\\\").replace("\"", "%22")
        .replace("\r", "").replace("\n", "")

    override def publish(files: Seq[Path]): Unit = {
      def post(contentType: String,
          body: java.net.http.HttpRequest.BodyPublisher): Unit = {
        val resp = Deploy.httpClient.send(
          java.net.http.HttpRequest.newBuilder(target)
            .header("Content-Type", contentType)
            .POST(body)
            .build(),
          java.net.http.HttpResponse.BodyHandlers.discarding())
        require(resp.statusCode / 100 == 2,
          s"HTTP ${resp.statusCode} deploying to $target")
      }
      if (multipart) {
        val boundary = "graft-" + java.util.UUID.randomUUID().toString
        val sep = "\r\n"
        // STREAMED multipart body: headers interleave with per-file
        // streams via SequenceInputStream, so a multi-GB export never
        // buffers on the driver heap (an export is the thing being
        // deployed — it can be as big as the data)
        val parts: Seq[() => java.io.InputStream] =
          files.zipWithIndex.flatMap { case (f, i) =>
            val head = (s"--$boundary$sep" +
              s"""Content-Disposition: form-data; name="file ${i + 1}"; """ +
              s"""filename="${safeName(f.getFileName.toString)}"$sep""" +
              s"Content-Type: application/octet-stream$sep$sep").getBytes("UTF-8")
            Seq(() => new java.io.ByteArrayInputStream(head),
              () => Files.newInputStream(f),
              () => new java.io.ByteArrayInputStream(sep.getBytes("UTF-8")))
          } :+ (() => new java.io.ByteArrayInputStream(
            s"--$boundary--$sep".getBytes("UTF-8")))
        // LAZY enumeration: one stream open at a time — eagerly opening
        // every part would hold an FD per export file for the whole
        // upload (thousands of part files = FD exhaustion before byte 1)
        post(s"multipart/form-data; boundary=$boundary",
          java.net.http.HttpRequest.BodyPublishers.ofInputStream(() => {
            val it = parts.iterator
            new java.io.SequenceInputStream(
              new java.util.Enumeration[java.io.InputStream] {
                override def hasMoreElements: Boolean = it.hasNext
                override def nextElement(): java.io.InputStream = it.next()()
              })
          }))
      } else {
        files.foreach(f =>
          post("application/octet-stream",
            java.net.http.HttpRequest.BodyPublishers.ofFile(f)))
      }
    }
  }

  /** Shared with the download source — one client, one config. */
  private def httpClient = Download.http

  /** List the data files of a Spark output directory (skips _SUCCESS/CRCs). */
  def outputFiles(outputDir: String): Seq[Path] = {
    val stream = Files.list(Paths.get(outputDir))
    // Files.list holds a directory descriptor until closed — repeated
    // exports would otherwise leak one per call
    try stream.iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .filterNot(p => p.getFileName.toString.startsWith("_") ||
        p.getFileName.toString.startsWith("."))
      .toSeq.sortBy(_.getFileName.toString)
    finally stream.close()
  }

  /** CreateZipArchive analog: zip an export output directory. */
  def zipOutput(outputDir: String, zipPath: String): Path = {
    val out = new ZipOutputStream(new BufferedOutputStream(
      new FileOutputStream(zipPath)))
    try {
      outputFiles(outputDir).foreach { f =>
        out.putNextEntry(new ZipEntry(f.getFileName.toString))
        val in = new BufferedInputStream(new FileInputStream(f.toFile))
        try {
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        } finally in.close()
        out.closeEntry()
      }
    } finally out.close()
    Paths.get(zipPath)
  }

  /** File-name pattern expansion (`ExportProfile.FileNamePattern`):
    * %timestamp%, %profile%, %seq% placeholders. */
  def expandFileName(pattern: String, profile: String, seq: Int,
      timestamp: String): String =
    pattern
      .replace("%profile%", profile)
      .replace("%seq%", f"$seq%04d")
      .replace("%timestamp%", timestamp)
}
