package graft.sinks

import java.io.{InputStream, OutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

/** Minimal MonetDB MAPI client — the raw-socket bulk channel behind the
  * C2 `COPY INTO ... FROM STDIN` load path (SURVEY.md §2.A11/§2.C2; the
  * reference drives the same protocol through monetdb-java's MapiSocket,
  * `CopyTool.java:966-1040`).
  *
  * Implemented from the public MAPI v9 wire description (MonetDB
  * documentation; the protocol is also implemented publicly by
  * monetdb-java and pymonetdb):
  *
  *  - the stream is a sequence of BLOCKS, each prefixed by a 2-byte
  *    little-endian header `(payloadLength << 1) | lastFlag`; payload is
  *    at most [[MapiBlockStream.MaxPayload]] (8190) bytes; a MESSAGE is
  *    the concatenation of consecutive blocks up to and including the
  *    first block with `lastFlag = 1`;
  *  - on connect the server sends a challenge message
  *    `salt:backend:version:hashes:endianness:pwhash:...`; the client
  *    answers `LIT:user:{RESP}digest:language:database:` where `digest`
  *    is `RESP(hex(PWHASH(password)) ++ salt)` in lowercase hex, `PWHASH`
  *    is the server-named password algorithm and `RESP` is chosen from
  *    the server's offered hash list;
  *  - an empty reply message means OK; `!...` lines are errors;
  *    `^mapi:merovingian:...` asks the client to re-authenticate against
  *    a fresh challenge on the same socket (the monetdbd proxy dance);
  *  - SQL statements are sent as one message: marker `s`, the statement
  *    text, terminating `;`. For `COPY INTO ... FROM STDIN` the CSV rows
  *    follow IN THE SAME MESSAGE, one record per line, closed by an
  *    empty line — then the server replies with an update result
  *    (`&2 <affected> ...`) or an error.
  */
object MapiBlockStream {
  /** Max payload bytes per block: 2-byte header stores length << 1, and
    * the canonical server block size is 8 KiB including the header. */
  val MaxPayload = 8190
}

final class MapiBlockStream(in: InputStream, out: OutputStream) {
  import MapiBlockStream.MaxPayload

  private def writeHeader(len: Int, last: Boolean): Unit = {
    val v = (len << 1) | (if (last) 1 else 0)
    out.write(v & 0xFF)
    out.write((v >>> 8) & 0xFF)
  }

  /** Write one complete message, chunked into blocks. */
  def writeMessage(payload: Array[Byte]): Unit = {
    var off = 0
    val n = payload.length
    while (n - off > MaxPayload) {
      writeHeader(MaxPayload, last = false)
      out.write(payload, off, MaxPayload)
      off += MaxPayload
    }
    writeHeader(n - off, last = true)
    out.write(payload, off, n - off)
    out.flush()
  }

  /** Write one message from a stream of chunks without materializing the
    * whole payload (the COPY INTO data path: the CSV for a 100 GB load
    * never exists in memory at once). Blocks are emitted as soon as they
    * fill; the final block carries the last flag. */
  def writeMessageStream(chunks: Iterator[Array[Byte]]): Unit = {
    val buf = new Array[Byte](MaxPayload)
    var fill = 0
    chunks.foreach { chunk =>
      var off = 0
      while (off < chunk.length) {
        val take = math.min(chunk.length - off, MaxPayload - fill)
        System.arraycopy(chunk, off, buf, fill, take)
        fill += take
        off += take
        if (fill == MaxPayload) {
          writeHeader(MaxPayload, last = false)
          out.write(buf, 0, MaxPayload)
          fill = 0
        }
      }
    }
    writeHeader(fill, last = true)
    out.write(buf, 0, fill)
    out.flush()
  }

  private def readFully(dst: Array[Byte], len: Int): Unit = {
    var off = 0
    while (off < len) {
      val n = in.read(dst, off, len - off)
      if (n < 0) throw new java.io.EOFException(
        s"MAPI stream closed mid-block ($off of $len payload bytes)")
      off += n
    }
  }

  /** Read one complete message (all blocks up to the last flag). */
  def readMessage(): String = {
    val sb = new java.lang.StringBuilder()
    var last = false
    while (!last) {
      val b0 = in.read()
      val b1 = in.read()
      if (b0 < 0 || b1 < 0) throw new java.io.EOFException(
        "MAPI stream closed before block header")
      val v = (b0 & 0xFF) | ((b1 & 0xFF) << 8)
      last = (v & 1) == 1
      val len = v >>> 1
      if (len > 0) {
        val payload = new Array[Byte](len)
        readFully(payload, len)
        sb.append(new String(payload, UTF_8))
      }
    }
    sb.toString
  }
}

/** Challenge-response math, separated for golden-testability. */
object MapiAuth {
  private val digestNames = Map(
    "SHA512" -> "SHA-512", "SHA384" -> "SHA-384", "SHA256" -> "SHA-256",
    "SHA224" -> "SHA-224", "SHA1" -> "SHA-1", "MD5" -> "MD5")

  /** Client preference order among the server's offered response hashes. */
  private val preference = Seq("SHA512", "SHA384", "SHA256", "SHA224", "SHA1", "MD5")

  def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"$b%02x").mkString

  def digestHex(algo: String, data: String): String = {
    val name = digestNames.getOrElse(algo,
      throw new IllegalArgumentException(s"unsupported MAPI hash algorithm '$algo'"))
    hex(MessageDigest.getInstance(name).digest(data.getBytes(UTF_8)))
  }

  final case class Challenge(salt: String, backend: String, version: Int,
      hashes: Seq[String], endianness: String, passwordAlgo: String)

  def parseChallenge(msg: String): Challenge = {
    val parts = msg.stripLineEnd.split(":", -1)
    require(parts.length >= 6, s"malformed MAPI challenge: '$msg'")
    Challenge(parts(0), parts(1), parts(2).toInt,
      parts(3).split(",").toSeq.map(_.trim).filter(_.nonEmpty),
      parts(4), parts(5))
  }

  /** Build the v9 login response line for a parsed challenge. */
  def loginResponse(challenge: Challenge, user: String, password: String,
      database: String, language: String = "sql"): String = {
    require(challenge.version == 9,
      s"unsupported MAPI protocol version ${challenge.version} (only 9)")
    val respAlgo = preference.find(challenge.hashes.contains).getOrElse(
      throw new IllegalArgumentException(
        s"no supported response hash among ${challenge.hashes.mkString(",")}"))
    val pwHex = digestHex(challenge.passwordAlgo, password)
    val digest = digestHex(respAlgo, pwHex + challenge.salt)
    s"LIT:$user:{$respAlgo}$digest:$language:$database:"
  }
}

final class MapiProtocolException(msg: String) extends RuntimeException(msg)

/** A connected, authenticated MAPI session. */
final class MapiClient private (socket: Socket, stream: MapiBlockStream) {

  /** Send one SQL statement; return the raw server response message.
    * Throws [[MapiProtocolException]] on any `!` line. */
  def query(sql: String): String = {
    stream.writeMessage(("s" + sql.stripSuffix(";") + ";").getBytes(UTF_8))
    checkResponse(stream.readMessage())
  }

  /** C2 bulk load: send the COPY statement and stream CSV records in the
    * same message (record separator `\n`, closed by an empty line — the
    * framing the reference performs through monetdb-java at
    * `CopyTool.java:995-1040`). Returns the server-reported affected-row
    * count when present. */
  def copyIntoStdin(copySql: String, csvLines: Iterator[String]): Long = {
    val head = Iterator.single(
      ("s" + copySql.stripSuffix(";") + ";\n").getBytes(UTF_8))
    val body = csvLines.map(l => (l + "\n").getBytes(UTF_8))
    val tail = Iterator.single("\n".getBytes(UTF_8))
    stream.writeMessageStream(head ++ body ++ tail)
    val resp = checkResponse(stream.readMessage())
    parseAffected(resp).getOrElse(-1L)
  }

  private def parseAffected(resp: String): Option[Long] =
    resp.linesIterator.collectFirst {
      case l if l.startsWith("&2 ") => l.split("\\s+")(1).toLong
    }

  private def checkResponse(resp: String): String = {
    val errs = resp.linesIterator.filter(_.startsWith("!")).toSeq
    if (errs.nonEmpty)
      throw new MapiProtocolException(errs.mkString("; ").stripPrefix("!"))
    resp
  }

  def close(): Unit = socket.close()
}

object MapiClient {
  /** Connect + authenticate (handling merovingian re-auth redirects). */
  def connect(host: String, port: Int, user: String, password: String,
      database: String, maxRedirects: Int = 10): MapiClient = {
    val socket = new Socket(host, port)
    socket.setTcpNoDelay(true)
    try {
      val stream = new MapiBlockStream(socket.getInputStream, socket.getOutputStream)
      var attempts = 0
      var done = false
      while (!done) {
        attempts += 1
        if (attempts > maxRedirects)
          throw new MapiProtocolException(s"too many MAPI redirects (> $maxRedirects)")
        val challenge = MapiAuth.parseChallenge(stream.readMessage())
        stream.writeMessage(
          MapiAuth.loginResponse(challenge, user, password, database).getBytes(UTF_8))
        val reply = stream.readMessage()
        if (reply.isEmpty) done = true
        else if (reply.linesIterator.exists(_.startsWith("!")))
          throw new MapiProtocolException(reply.stripPrefix("!").stripLineEnd)
        else if (reply.startsWith("^mapi:merovingian:")) () // re-auth on same socket
        else if (reply.startsWith("^"))
          throw new MapiProtocolException(
            s"MAPI full redirect not supported by this client: ${reply.stripLineEnd}")
        else done = true // informational message; treat as success
      }
      new MapiClient(socket, stream)
    } catch { case e: Throwable => socket.close(); throw e }
  }
}
