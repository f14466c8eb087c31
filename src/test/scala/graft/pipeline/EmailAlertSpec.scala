package graft.pipeline

import java.io.{BufferedReader, InputStreamReader}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import org.scalatest.funsuite.AnyFunSuite

/** H5: SMTP alert mailer vs a loopback fake server (no javax.mail, no
  * network). Mirrors `EmailUtil.java:28-110` policy decisions. */
class EmailAlertSpec extends AnyFunSuite {
  import EmailAlert._

  /** One-connection fake SMTP server; records the full client dialogue. */
  private final class FakeSmtp(failRcpt: Boolean = false,
      advertiseStartTls: Boolean = false) {
    val server = new ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
    @volatile var lines: Vector[String] = Vector.empty
    val thread = new Thread(() => {
      val s = server.accept()
      val in = new BufferedReader(new InputStreamReader(s.getInputStream, UTF_8))
      val out = s.getOutputStream
      def reply(r: String): Unit = { out.write((r + "\r\n").getBytes(UTF_8)); out.flush() }
      reply("220 fake ESMTP")
      var inData = false
      var line = in.readLine()
      while (line != null) {
        lines :+= line
        if (inData) {
          if (line == ".") { inData = false; reply("250 OK queued") }
        } else line.takeWhile(_ != ' ') match {
          case "EHLO" =>
            reply("250-fake")
            if (advertiseStartTls) reply("250-STARTTLS")
            reply("250 AUTH LOGIN")
          case "STARTTLS" => reply("220 ready for TLS")
          case "AUTH" => reply("334 VXNlcm5hbWU6")
          case "DATA" => inData = true; reply("354 go ahead")
          case "QUIT" => reply("221 bye"); s.close()
          case "MAIL" => reply("250 OK")
          case "RCPT" => if (failRcpt) reply("550 no such user") else reply("250 OK")
          case _      => reply("250 OK") // auth payloads etc.
        }
        line = if (s.isClosed) null else in.readLine()
      }
    })
    thread.setDaemon(true); thread.start()
    def port: Int = server.getLocalPort
    def connect: (String, Int) => Socket = (_, _) =>
      new Socket(java.net.InetAddress.getLoopbackAddress, port)
  }

  private def baseProps(port: Int) = Map(
    "mail.enabled" -> "true",
    "mail.server" -> "127.0.0.1",
    "mail.port" -> port.toString,
    "mail.from" -> "job@example.org",
    "mail.to" -> "ops@example.org, oncall@example.org",
    "mail.subject" -> "job failed")

  test("full dialogue: EHLO, MAIL, both RCPTs, headers, dot-stuffed body") {
    val srv = new FakeSmtp()
    val cfg = fromProps(baseProps(srv.port))
    val r = sendMail(cfg, "line1\n.starts with dot", connect = srv.connect)
    srv.thread.join(5000)
    assert(r == Sent)
    val d = srv.lines
    assert(d.exists(_.startsWith("EHLO")))
    assert(d.contains("MAIL FROM:<job@example.org>"))
    assert(d.contains("RCPT TO:<ops@example.org>"))
    assert(d.contains("RCPT TO:<oncall@example.org>"))
    assert(d.contains("Subject: job failed"))
    assert(d.contains("To: ops@example.org, oncall@example.org"))
    assert(d.contains("..starts with dot")) // RFC 5321 dot-stuffing
    assert(!d.contains(".starts with dot"))
    assert(d.contains("."))
  }

  test("AUTH LOGIN sent only when username+password configured") {
    val srv = new FakeSmtp()
    val cfg = fromProps(baseProps(srv.port) ++
      Map("mail.username" -> "u", "mail.password" -> "p"))
    assert(sendMail(cfg, "m", connect = srv.connect) == Sent)
    srv.thread.join(5000)
    assert(srv.lines.contains("AUTH LOGIN"))
    assert(srv.lines.contains(Base64.getEncoder.encodeToString("u".getBytes(UTF_8))))

    val srv2 = new FakeSmtp()
    val cfg2 = fromProps(baseProps(srv2.port)) // no credentials
    assert(sendMail(cfg2, "m", connect = srv2.connect) == Sent)
    srv2.thread.join(5000)
    assert(!srv2.lines.exists(_.startsWith("AUTH")))
  }

  test("STARTTLS: EHLO → STARTTLS → EHLO → AUTH ordering when advertised + creds") {
    val srv = new FakeSmtp(advertiseStartTls = true)
    val cfg = fromProps(baseProps(srv.port) ++
      Map("mail.username" -> "u", "mail.password" -> "p"))
    var upgraded = false
    // identity upgrade: the fake can't speak TLS; the ordering and the
    // rewrap hook firing are what the RFC 3207 flow requires
    val r = sendMail(cfg, "m", connect = srv.connect,
      upgrade = Some(s => { upgraded = true; s }))
    srv.thread.join(5000)
    assert(r == Sent && upgraded)
    val d = srv.lines
    val ehlos = d.zipWithIndex.collect { case (l, i) if l.startsWith("EHLO") => i }
    val startTls = d.indexOf("STARTTLS")
    val auth = d.indexOf("AUTH LOGIN")
    // EHLO, then STARTTLS, then a SECOND EHLO on the upgraded channel,
    // and only then AUTH (EmailUtil.java:78 parity; RFC 3207 §4.2)
    assert(ehlos.size == 2, s"expected 2 EHLOs, dialogue: $d")
    assert(ehlos.head < startTls && startTls < ehlos(1) && ehlos(1) < auth)
  }

  test("STARTTLS skipped when the server does not advertise it (enable, not require)") {
    val srv = new FakeSmtp() // no STARTTLS capability
    val cfg = fromProps(baseProps(srv.port) ++
      Map("mail.username" -> "u", "mail.password" -> "p"))
    val r = sendMail(cfg, "m", connect = srv.connect,
      upgrade = Some(_ => fail("must not upgrade")))
    srv.thread.join(5000)
    assert(r == Sent)
    assert(!srv.lines.contains("STARTTLS"))
    assert(srv.lines.contains("AUTH LOGIN"))
  }

  test("mail.starttls.required: no STARTTLS advertised + creds → fail, no AUTH leak") {
    val srv = new FakeSmtp() // capability stripped / absent
    val cfg = fromProps(baseProps(srv.port) ++ Map(
      "mail.username" -> "u", "mail.password" -> "p",
      "mail.starttls.required" -> "true"))
    val e = intercept[java.io.IOException] {
      sendMail(cfg, "m", connect = srv.connect,
        upgrade = Some(_ => fail("must not upgrade")))
    }
    assert(e.getMessage.contains("starttls.required"))
    srv.thread.join(5000)
    // the downgrade MITM got nothing: no AUTH, no base64 credentials
    assert(!srv.lines.exists(_.startsWith("AUTH")))
    assert(!srv.lines.contains(java.util.Base64.getEncoder
      .encodeToString("p".getBytes(UTF_8))))
  }

  test("mail.starttls.required applies without credentials too") {
    // javax.mail's required flag fails the session regardless of auth;
    // the alert body (stack traces) deserves the protection, not just
    // the AUTH exchange
    val plain = new FakeSmtp() // no STARTTLS capability
    val cfgNoCreds = fromProps(baseProps(plain.port) ++ Map(
      "mail.starttls.required" -> "true"))
    val e = intercept[java.io.IOException] {
      sendMail(cfgNoCreds, "m", connect = plain.connect,
        upgrade = Some(_ => fail("must not upgrade")))
    }
    assert(e.getMessage.contains("starttls.required"))
    // and with the capability advertised, the credential-less session
    // upgrades and sends
    val tls = new FakeSmtp(advertiseStartTls = true)
    assert(sendMail(fromProps(baseProps(tls.port) ++ Map(
      "mail.starttls.required" -> "true")), "m",
      connect = tls.connect, upgrade = Some(identity)) == Sent)
    tls.thread.join(5000)
    assert(tls.lines.contains("STARTTLS"))
    assert(!tls.lines.exists(_.startsWith("AUTH")))
  }

  test("mail.starttls.required passes normally when the server advertises it") {
    val srv = new FakeSmtp(advertiseStartTls = true)
    val cfg = fromProps(baseProps(srv.port) ++ Map(
      "mail.username" -> "u", "mail.password" -> "p",
      "mail.starttls.required" -> "true"))
    assert(sendMail(cfg, "m", connect = srv.connect,
      upgrade = Some(identity)) == Sent)
    srv.thread.join(5000)
    assert(srv.lines.contains("STARTTLS"))
  }

  test("STARTTLS not attempted without credentials even when advertised") {
    val srv = new FakeSmtp(advertiseStartTls = true)
    val cfg = fromProps(baseProps(srv.port)) // no creds
    assert(sendMail(cfg, "m", connect = srv.connect,
      upgrade = Some(_ => fail("must not upgrade"))) == Sent)
    srv.thread.join(5000)
    assert(!srv.lines.contains("STARTTLS") && !srv.lines.exists(_.startsWith("AUTH")))
  }

  test("policy: disabled → skip; missing server/port → skip with warning") {
    assert(sendMail(fromProps(Map.empty), "m",
      connect = (_, _) => fail("must not connect")) == Skipped("error mails disabled"))
    assert(sendMail(fromProps(Map("mail.enabled" -> "true")), "m",
      connect = (_, _) => fail("must not connect")) == Skipped("no e-mail properties set"))
    // "yes" counts as enabled, like the reference's getBooleanProperty
    assert(fromProps(Map("mail.enabled" -> "yes")).enabled)
  }

  test("default subject when none configured (EmailUtil.java:55-56)") {
    val srv = new FakeSmtp()
    val cfg = fromProps(baseProps(srv.port) - "mail.subject")
    assert(sendMail(cfg, "m", connect = srv.connect) == Sent)
    srv.thread.join(5000)
    assert(srv.lines.contains(s"Subject: ${EmailAlert.DefaultSubject}"))
  }

  test("server rejection (550 RCPT) raises, like MessagingException") {
    val srv = new FakeSmtp(failRcpt = true)
    val cfg = fromProps(baseProps(srv.port))
    val e = intercept[java.io.IOException](sendMail(cfg, "m", connect = srv.connect))
    assert(e.getMessage.contains("550"))
  }

  test("alertHook formats reason + stack trace into the body") {
    val srv = new FakeSmtp()
    val cfg = fromProps(baseProps(srv.port))
    val boom = new RuntimeException("boom")
    EmailAlert.alertHook(cfg, srv.connect)(CopyJob.Failed("load failed", Some(boom)))
    srv.thread.join(5000)
    assert(srv.lines.contains("load failed"))
    assert(srv.lines.exists(_.contains("java.lang.RuntimeException: boom")))
  }
}
