package graft.pipeline

import java.io.{BufferedReader, InputStreamReader, OutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

/** H5 failure alerting: the reference e-mails job failures through
  * javax.mail (`EmailUtil.java:28-110`, config keys
  * `CONFIG_KEYS.java:10-17`). This is the equivalent reference
  * implementation for the [[CopyJob.runWithAlert]] hook — a minimal
  * driver-side SMTP (RFC 5321) client with optional AUTH LOGIN,
  * loopback-testable without a mail server.
  *
  * Policy parity with the reference:
  *  - `mail.enabled` false/absent → silently skip ("error mails
  *    disabled");
  *  - missing `mail.server`/`mail.port` → skip with a warning;
  *  - empty subject → default "Error in MSSQL2MonetDB job";
  *  - AUTH only when both username and password are non-blank;
  *  - STARTTLS before AUTH whenever credentials are configured AND the
  *    server advertises it (`EmailUtil.java:78` sets
  *    `mail.smtp.starttls.enable=true` alongside auth; javax.mail's
  *    enable-not-require semantics: upgrade when offered, proceed in
  *    plaintext when not) — the socket is rewrapped through
  *    `SSLSocketFactory` and EHLO is re-sent on the encrypted channel,
  *    as RFC 3207 §4.2 requires;
  *  - comma-separated `mail.to` recipient list.
  */
object EmailAlert {

  final case class MailConfig(
      enabled: Boolean,
      server: Option[String], port: Option[Int],
      from: String, to: Seq[String],
      subject: Option[String],
      username: Option[String], password: Option[String],
      /** `mail.starttls.required` (the javax.mail
        * `mail.smtp.starttls.required` analogue, opt-in): a server that
        * does not advertise STARTTLS fails the send — with credentials
        * configured that keeps AUTH LOGIN out of plaintext, and without
        * them it still protects the alert body. Closes the capability-
        * stripping downgrade the enable-not-require default (reference
        * parity, `EmailUtil.java:78`) is exposed to. */
      requireTls: Boolean = false)

  val DefaultSubject = "Error in MSSQL2MonetDB job"

  /** Parse the reference's `mail.*` property surface
    * (`CONFIG_KEYS.java:10-17`). */
  def fromProps(props: Map[String, String]): MailConfig = {
    def nonBlank(k: String) = props.get(k).map(_.trim).filter(_.nonEmpty)
    MailConfig(
      enabled = props.get("mail.enabled").exists(v =>
        v.equalsIgnoreCase("true") || v.equalsIgnoreCase("yes")),
      server = nonBlank("mail.server"),
      port = nonBlank("mail.port").flatMap(_.toIntOption),
      from = nonBlank("mail.from").getOrElse(""),
      to = nonBlank("mail.to").toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty),
      subject = nonBlank("mail.subject"),
      username = nonBlank("mail.username"),
      password = nonBlank("mail.password"),
      requireTls = props.get("mail.starttls.required").exists(v =>
        v.equalsIgnoreCase("true") || v.equalsIgnoreCase("yes")))
  }

  sealed trait SendResult
  case object Sent extends SendResult
  final case class Skipped(reason: String) extends SendResult

  /** RFC 3207 upgrade: wrap the plaintext socket in TLS (client mode)
    * and complete the handshake. `host` feeds SNI AND endpoint
    * identification — without the explicit
    * `setEndpointIdentificationAlgorithm`, `startHandshake` validates
    * only the chain, so ANY CA-signed certificate (for any hostname)
    * would pass and AUTH credentials would flow to a MITM. */
  def tlsUpgrade(host: String): Socket => Socket = plain => {
    val factory = javax.net.ssl.SSLSocketFactory.getDefault
      .asInstanceOf[javax.net.ssl.SSLSocketFactory]
    val tls = factory.createSocket(plain, host, plain.getPort, true)
      .asInstanceOf[javax.net.ssl.SSLSocket]
    tls.setUseClientMode(true)
    val params = tls.getSSLParameters
    params.setEndpointIdentificationAlgorithm("HTTPS")
    tls.setSSLParameters(params)
    tls.startHandshake()
    tls
  }

  /** Send `message` per the config's policy. `connect` is injectable so
    * specs can point at a loopback fake; `upgrade` likewise (the
    * STARTTLS socket rewrap — identity in specs, real TLS by default).
    * Protocol errors throw (the reference wraps MessagingException in
    * RuntimeException). */
  def sendMail(cfg: MailConfig, message: String,
      subject: Option[String] = None,
      connect: (String, Int) => Socket = new Socket(_, _),
      upgrade: Option[Socket => Socket] = None): SendResult = {
    if (!cfg.enabled) return Skipped("error mails disabled")
    (cfg.server, cfg.port) match {
      case (Some(server), Some(port)) =>
        val socket = connect(server, port)
        try {
          smtpSession(socket, cfg,
            subject.orElse(cfg.subject).filter(_.nonEmpty).getOrElse(DefaultSubject),
            message, upgrade.getOrElse(tlsUpgrade(server)))
          Sent
        } finally socket.close()
      case _ => Skipped("no e-mail properties set")
    }
  }

  /** Alert hook for [[CopyJob.runWithAlert]]: failure reason + stack
    * trace as the body, mirroring `EmailUtil.sendMail(Exception, ...)`. */
  def alertHook(cfg: MailConfig,
      connect: (String, Int) => Socket = new Socket(_, _)): CopyJob.Failed => Unit =
    f => {
      val trace = f.cause.map { e =>
        val sw = new java.io.StringWriter()
        e.printStackTrace(new java.io.PrintWriter(sw))
        sw.toString
      }.getOrElse("")
      sendMail(cfg, s"${f.reason}\n\n$trace", connect = connect)
      ()
    }

  private def smtpSession(socket: Socket, cfg: MailConfig, subject: String,
      body: String, upgrade: Socket => Socket): Unit = {
    var in = new BufferedReader(new InputStreamReader(socket.getInputStream, UTF_8))
    var out: OutputStream = socket.getOutputStream

    def send(line: String): Unit = {
      out.write((line + "\r\n").getBytes(UTF_8)); out.flush()
    }
    /** Read one (possibly multi-line `250-...`) reply; fail outside
      * 2xx/3xx. Returns ALL reply lines (EHLO capability scan). */
    def expect(what: String): Seq[String] = {
      var line = in.readLine()
      if (line == null) throw new java.io.IOException(s"SMTP: connection closed during $what")
      val code = line.take(3)
      var all = Vector(line)
      while (line.length > 3 && line.charAt(3) == '-') {
        line = in.readLine()
        // server closing mid `250-` continuation is the same failure as
        // closing before the first line — not an NPE
        if (line == null)
          throw new java.io.IOException(s"SMTP: connection closed during $what")
        all :+= line
      }
      if (code.isEmpty || (code.charAt(0) != '2' && code.charAt(0) != '3'))
        throw new java.io.IOException(s"SMTP: unexpected reply to $what: $line")
      all
    }

    expect("greeting")
    send("EHLO graft")
    var capabilities = expect("EHLO")
    val creds = (cfg.username, cfg.password) match {
      case (Some(u), Some(p)) => Some((u, p))
      case _                  => None
    }
    // reference parity: auth configured ⇒ starttls.enable
    // (EmailUtil.java:78). Enable ≠ require: upgrade only when the
    // server offers it, like javax.mail. `requireTls` hardens that to
    // javax.mail's mail.smtp.starttls.required semantics — the session
    // fails without TLS whether or not credentials are configured (the
    // alert BODY, stack traces included, deserves the flag too, not
    // just the AUTH exchange).
    if (creds.isDefined || cfg.requireTls) {
      if (capabilities.exists(_.drop(4).trim.equalsIgnoreCase("STARTTLS"))) {
        send("STARTTLS"); expect("STARTTLS")
        val tls = upgrade(socket)
        in = new BufferedReader(new InputStreamReader(tls.getInputStream, UTF_8))
        out = tls.getOutputStream
        // RFC 3207 §4.2: the client MUST discard pre-TLS server
        // knowledge and re-EHLO on the encrypted channel
        send("EHLO graft")
        capabilities = expect("EHLO after STARTTLS")
      } else if (cfg.requireTls) {
        // require mode: a MITM stripping STARTTLS from the EHLO reply
        // must not be able to downgrade the session
        throw new java.io.IOException(
          "SMTP: mail.starttls.required is set but the server did not " +
            "advertise STARTTLS — refusing to send in plaintext")
      }
    }
    creds.foreach { case (u, p) =>
      send("AUTH LOGIN"); expect("AUTH LOGIN")
      send(Base64.getEncoder.encodeToString(u.getBytes(UTF_8))); expect("username")
      send(Base64.getEncoder.encodeToString(p.getBytes(UTF_8))); expect("password")
    }
    send(s"MAIL FROM:<${cfg.from}>"); expect("MAIL FROM")
    cfg.to.foreach { rcpt => send(s"RCPT TO:<$rcpt>"); expect("RCPT TO") }
    send("DATA"); expect("DATA")
    writeData(out, cfg, subject, body)
    expect("message body")
    send("QUIT") // reply optional; don't block on it
  }

  private def writeData(out: OutputStream, cfg: MailConfig, subject: String,
      body: String): Unit = {
    val headers = Seq(
      s"From: ${cfg.from}",
      s"To: ${cfg.to.mkString(", ")}",
      s"Subject: $subject",
      "MIME-Version: 1.0",
      "Content-Type: text/plain; charset=utf-8")
    // RFC 5321 §4.5.2 dot-stuffing, CRLF line endings, terminating "."
    val stuffed = body.linesIterator
      .map(l => if (l.startsWith(".")) "." + l else l)
    val msg = (headers ++ Seq("") ++ stuffed).mkString("", "\r\n", "\r\n.\r\n")
    out.write(msg.getBytes(UTF_8)); out.flush()
  }
}
