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
  * local-folder publishing, zip archiving, HTTP, FTP and email-queue
  * publishing are implemented. HTTP and FTP speak the real protocols and
  * are loopback-tested (no egress here); the email publisher QUEUES
  * messages exactly like the reference (EmailFilePublisher builds
  * QueuedEmail rows — it never talks SMTP itself; a send worker drains
  * the queue later). */
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

  /** FtpFilePublisher analog (FtpFilePublisher.cs:14-66): upload the
    * produced files over FTP(S). A missing scheme defaults to ftp:// and
    * a custom port applies only when the URL names one, like the
    * reference; the target path is the URL's path with a trailing slash
    * (`_rootPath`). Speaks the classic control/data protocol directly
    * over sockets — USER/PASS login, TYPE I, then one PASV + STOR round
    * per file with the file STREAMED onto the data socket (never
    * buffered: an export can be as big as the data).
    *
    * FTPS (`FtpFilePublisher` `UseSsl`, i.e. .NET `EnableSsl`): an
    * ftps:// scheme (or an explicit `sslContext`) upgrades the control
    * channel via explicit AUTH TLS before login and protects every data
    * connection with PBSZ 0 + PROT P, wrapping each PASV data socket in
    * client-mode TLS — loopback-tested against a self-signed TLS peer
    * in ExportDeploySpec. `sslContext` is the trust seam: production
    * verifies against the platform default, tests pin the loopback
    * certificate. */
  final class FtpPublisher(url: String, username: String, password: String,
      sslContext: Option[javax.net.ssl.SSLContext] = None)
      extends Publisher {

    private def tlsWrap(plain: java.net.Socket, host: String): java.net.Socket = {
      val ctx = sslContext.getOrElse(javax.net.ssl.SSLContext.getDefault)
      val s = ctx.getSocketFactory
        .createSocket(plain, host, plain.getPort, true)
        .asInstanceOf[javax.net.ssl.SSLSocket]
      s.setUseClientMode(true)
      s.startHandshake()
      s
    }

    override def publish(files: Seq[Path]): Unit = {
      val clean = url.replace('\\', '/')
      val uri = java.net.URI.create(
        if (clean.matches("(?i)^ftps?://.*")) clean else s"ftp://$clean")
      val useSsl = "ftps".equalsIgnoreCase(uri.getScheme) || sslContext.isDefined
      val port = if (uri.getPort > 0) uri.getPort else 21
      val root = Option(uri.getPath).filter(_.nonEmpty).getOrElse("/") match {
        case p if p.endsWith("/") => p
        case p => p + "/"
      }
      var sock = new java.net.Socket(uri.getHost, port)
      try {
        sock.setSoTimeout(30000)
        var out: BufferedOutputStream = null
        var reader: java.io.BufferedReader = null
        def bind(): Unit = {
          out = new BufferedOutputStream(sock.getOutputStream)
          reader = new java.io.BufferedReader(new java.io.InputStreamReader(
            new BufferedInputStream(sock.getInputStream), "ISO-8859-1"))
        }
        bind()

        /** One (possibly multi-line "nnn-…nnn ") reply: (code, full text). */
        def reply(): (Int, String) = {
          val first = reader.readLine()
          require(first != null && first.length >= 3, "FTP control channel closed")
          val code = first.substring(0, 3)
          val sb = new StringBuilder(first)
          if (first.length > 3 && first.charAt(3) == '-') {
            var line = ""
            while ({
              line = reader.readLine()
              require(line != null, "FTP control channel closed mid-reply")
              sb.append('\n').append(line)
              !(line.startsWith(code) && line.length > 3 && line.charAt(3) == ' ')
            }) ()
          }
          (code.toInt, sb.toString)
        }
        def cmd(c: String, expect: Int*): (Int, String) = {
          out.write((c + "\r\n").getBytes("ISO-8859-1")); out.flush()
          val r = reply()
          require(expect.contains(r._1), s"FTP ${c.takeWhile(_ != ' ')} → ${r._2}")
          r
        }

        require(reply()._1 == 220, "no FTP greeting")
        if (useSsl) {
          // explicit FTPS: upgrade BEFORE credentials cross the wire
          cmd("AUTH TLS", 234)
          sock = tlsWrap(sock, uri.getHost)
          bind()
          cmd("PBSZ 0", 200)
          cmd("PROT P", 200)
        }
        if (cmd(s"USER $username", 331, 230)._1 == 331) cmd(s"PASS $password", 230)
        cmd("TYPE I", 200)

        files.foreach { f =>
          // 227 Entering Passive Mode (h1,h2,h3,h4,p1,p2)
          val (_, pasv) = cmd("PASV", 227)
          val m = "\\((\\d+),(\\d+),(\\d+),(\\d+),(\\d+),(\\d+)\\)".r
            .findFirstMatchIn(pasv)
            .getOrElse(throw new IllegalStateException(s"unparsable PASV: $pasv"))
          val host = (1 to 4).map(m.group).mkString(".")
          val dataPort = m.group(5).toInt * 256 + m.group(6).toInt
          // Connect the data socket BEFORE issuing STOR: many servers only
          // emit the 150/125 preliminary reply after accepting the data
          // connection, so the reverse order can deadlock until SoTimeout.
          // Under PROT P the payload channel is TLS-wrapped too — but the
          // handshake happens AFTER the 150 (the server only wraps its
          // end once the transfer is announced; both sides handshaking at
          // connect time would deadlock against each other).
          val plainData = new java.net.Socket(host, dataPort)
          var data: java.net.Socket = plainData
          try {
            cmd(s"STOR $root${f.getFileName}", 150, 125)
            if (useSsl) data = tlsWrap(plainData, host)
            val ds = new BufferedOutputStream(data.getOutputStream)
            Files.copy(f, ds)
            ds.flush()
          } finally data.close()
          val (done, text) = reply()
          require(done == 226 || done == 250, s"FTP STOR did not complete: $text")
        }
        cmd("QUIT", 221)
      } finally sock.close()
    }
  }

  // ---- email deployment (queue semantics, EmailFilePublisher.cs) -------

  /** `QueuedEmailAttachment` analog: name + mapped mime type + blob. */
  final case class EmailAttachment(name: String, mimeType: String, blob: Array[Byte])

  /** `QueuedEmail` analog. Body mirrors the reference quirk of being the
    * SUBJECT text (EmailFilePublisher.cs:52: `Body =
    * deployment.EmailSubject.NaIfEmpty()`). */
  final case class QueuedEmail(from: String, to: String, subject: String,
      body: String, attachments: Seq[EmailAttachment])

  /** Queue seam — the reference's `_db.QueuedEmails` + per-email
    * `SaveChangesAsync` ("Blob data could be large, so better not bulk
    * commit here"): enqueue is called once per recipient, not batched. */
  trait EmailQueue { def enqueue(email: QueuedEmail): Unit }

  final class InMemoryEmailQueue extends EmailQueue {
    val queued = new java.util.concurrent.ConcurrentLinkedQueue[QueuedEmail]()
    override def enqueue(email: QueuedEmail): Unit = queued.add(email)
  }

  /** `MimeTypes.MapNameToMimeType` for the formats this engine exports. */
  def mimeOf(name: String): String =
    name.toLowerCase.replaceAll("^.*\\.", "") match {
      case "csv"           => "text/csv"
      case "xml"           => "application/xml"
      case "json"          => "application/json"
      case "txt"           => "text/plain"
      case "zip"           => "application/zip"
      case "xlsx"          => "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"
      case _               => "application/octet-stream"
    }

  /** EmailFilePublisher analog (EmailFilePublisher.cs:28-77): split the
    * recipient list on ',', keep only well-formed addresses, and when
    * none remain do NOTHING (the reference returns silently). One
    * QueuedEmail per recipient, each carrying every deployment file as
    * a blob attachment with its mapped mime type; empty subject becomes
    * "n/a" (`NaIfEmpty`) for subject AND body. */
  final class EmailPublisher(queue: EmailQueue, addresses: String,
      from: String, subject: String) extends Publisher {
    override def publish(files: Seq[Path]): Unit = {
      val tos = wellFormedAddresses(addresses)
      if (tos.isEmpty) return
      val subj = if (subject == null || subject.trim.isEmpty) "n/a" else subject
      val attachments = files.map(f => EmailAttachment(
        f.getFileName.toString, mimeOf(f.getFileName.toString),
        Files.readAllBytes(f)))
      tos.foreach(to =>
        queue.enqueue(QueuedEmail(from, to, subj, subj, attachments)))
    }
  }

  private val emailRe = "^[^@\\s,]+@[^@\\s,]+\\.[^@\\s,]+$".r

  /** The reference's recipient-list parse (EmailFilePublisher.cs:38-44 /
    * DataExporter.cs:1471-1479 share it): split on ',', trim, keep only
    * well-formed addresses. ONE definition — the email publisher and the
    * export completion email must never disagree on well-formedness. */
  def wellFormedAddresses(addresses: String): Seq[String] =
    addresses.split(',').map(_.trim)
      .filter(a => emailRe.pattern.matcher(a).matches).toSeq

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
