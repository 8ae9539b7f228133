package graft

import java.io.{BufferedOutputStream, BufferedReader, InputStreamReader}
import java.net.{InetAddress, ServerSocket, Socket}
import java.util.concurrent.ConcurrentHashMap

/** Minimal loopback FTP server — the no-egress way to drive the REAL
  * FtpPublisher protocol path (same trick as the loopback HttpServer for
  * HTTP deployment): USER/PASS auth, TYPE, PASV, STOR, QUIT, one data
  * connection per transfer. Stores uploads in memory keyed by the STOR
  * path. With an `ssl` context it also speaks explicit FTPS: AUTH TLS
  * upgrades the control channel (server-mode wrap), PBSZ/PROT are
  * accepted, and each data connection is TLS-wrapped after accept —
  * the loopback peer the FTPS path is tested against. Test scope only. */
final class LoopbackFtp(user: String, pass: String,
    ssl: Option[javax.net.ssl.SSLContext] = None) extends AutoCloseable {
  private val server =
    new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
  val port: Int = server.getLocalPort
  val stored = new ConcurrentHashMap[String, Array[Byte]]()
  @volatile private var running = true

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        val t = new Thread(() => handle(s))
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception => () } // socket closed on shutdown
    }
  })
  acceptor.setDaemon(true)
  acceptor.start()

  private def tlsWrapServer(plain: Socket): Socket = {
    val s = ssl.get.getSocketFactory
      .createSocket(plain, null, plain.getPort, true)
      .asInstanceOf[javax.net.ssl.SSLSocket]
    s.setUseClientMode(false)
    s.startHandshake()
    s
  }

  private def handle(sock0: Socket): Unit = {
    var sock = sock0
    try {
      sock.setSoTimeout(30000)
      var in: BufferedReader = null
      var out: BufferedOutputStream = null
      def bind(): Unit = {
        in = new BufferedReader(
          new InputStreamReader(sock.getInputStream, "ISO-8859-1"))
        out = new BufferedOutputStream(sock.getOutputStream)
      }
      bind()
      def send(line: String): Unit = {
        out.write((line + "\r\n").getBytes("ISO-8859-1")); out.flush()
      }
      send("220 graft loopback FTP ready")
      var pendingUser: String = null
      var authed = false
      var protP = false
      var dataServer: ServerSocket = null
      var line = in.readLine()
      while (line != null) {
        val sp = line.indexOf(' ')
        val cmd = (if (sp < 0) line else line.substring(0, sp)).toUpperCase
        val arg = if (sp < 0) "" else line.substring(sp + 1)
        cmd match {
          case "AUTH" if ssl.isDefined && arg.equalsIgnoreCase("TLS") =>
            send("234 proceed with negotiation")
            sock = tlsWrapServer(sock)
            bind()
          case "PBSZ" => send("200 PBSZ=0")
          case "PROT" =>
            protP = arg.equalsIgnoreCase("P"); send("200 protection level set")
          case "USER" =>
            pendingUser = arg; send("331 password required")
          case "PASS" =>
            if (pendingUser == user && arg == pass) {
              authed = true; send("230 logged in")
            } else send("530 login incorrect")
          case "TYPE" => send("200 type set")
          case "PASV" =>
            if (!authed) send("530 not logged in")
            else {
              if (dataServer != null) dataServer.close()
              dataServer = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
              dataServer.setSoTimeout(10000) // a non-connecting client fails fast

              val p = dataServer.getLocalPort
              send(s"227 Entering Passive Mode (127,0,0,1,${p / 256},${p % 256})")
            }
          case "STOR" =>
            if (!authed) send("530 not logged in")
            else if (dataServer == null) send("425 use PASV first")
            else {
              // Like real servers (vsftpd, proftpd): the 150 preliminary
              // reply is only emitted AFTER the data connection is
              // accepted, so a client that waits for 150 before
              // connecting would deadlock here — the order bug ADVICE r8
              // flagged in FtpPublisher. Under PROT P the accepted socket
              // is TLS-wrapped after the 150 (matching the client, which
              // handshakes only once the transfer is announced).
              var data = dataServer.accept()
              send("150 opening data connection")
              try {
                if (protP) data = tlsWrapServer(data)
                stored.put(arg, data.getInputStream.readAllBytes())
              } finally { data.close(); dataServer.close(); dataServer = null }
              send("226 transfer complete")
            }
          case "QUIT" =>
            send("221 bye"); sock.close(); return
          case _ => send("502 not implemented")
        }
        line = in.readLine()
      }
    } catch { case _: Exception => () } // connection torn down
    finally { try sock.close() catch { case _: Exception => () } }
  }

  override def close(): Unit = { running = false; server.close() }
}
