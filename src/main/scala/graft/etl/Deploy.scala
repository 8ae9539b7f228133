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
  * local-folder publishing and zip archiving are implemented, remote
  * transports (FTP/HTTP/email) are interface stubs — this container has no
  * egress, and a production deployment would plug transport clients in. */
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
