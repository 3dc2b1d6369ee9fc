package graft.sources

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.time.format.DateTimeFormatter
import java.time.{ZoneOffset, ZonedDateTime}
import java.util.Locale

/** S10: SMTP email sink — the full EmailOperator analog
  * (`dags/example_dag_decorator.py:69-71`: to / subject / html_content).
  *
  * Plain-socket RFC 5321 client, zero dependencies: HELO → MAIL FROM →
  * RCPT TO (one per recipient) → DATA (RFC 5322 headers + HTML body,
  * dot-stuffed) → QUIT. Driver-side by design — notification happens
  * once per pipeline run after an action, exactly like the reference's
  * EmailOperator task; nothing here touches executors.
  *
  * Delivery failures raise with the offending SMTP reply so a pipeline
  * SLA/failure hook (see [[graft.pipeline.Pipeline]]) can react;
  * SmtpSpec exercises the full dialogue against a loopback server.
  */
object Smtp {

  final case class Message(
      from: String,
      to: Seq[String],
      subject: String,
      htmlContent: String)

  /** A [[Sinks.Notifier]] delivering over SMTP. */
  def notifier(host: String, port: Int = 25,
      from: String = "graft@localhost"): Sinks.Notifier =
    (to: String, subject: String, body: String) =>
      send(host, port, Message(from, Seq(to), subject, body))

  def send(host: String, port: Int, msg: Message): Unit = {
    require(msg.to.nonEmpty, "at least one recipient")
    (msg.from +: msg.to).foreach { a =>
      require(!a.exists(c => c == '\r' || c == '\n' || c == '>' || c == '<'),
        s"illegal address: $a") // header/command injection guard
    }
    val subject = sanitizeHeader(msg.subject) // validate before connecting
    val socket = new Socket(host, port)
    try {
      socket.setSoTimeout(10000)
      val in = new BufferedReader(new InputStreamReader(
        socket.getInputStream, StandardCharsets.UTF_8))
      // explicit UTF-8: the MIME headers declare charset=utf-8, and a
      // platform-default writer would mislabel (and mangle) non-ASCII
      val out = new PrintWriter(new java.io.OutputStreamWriter(
        socket.getOutputStream, StandardCharsets.UTF_8), false)

      // One SMTP reply (handles multi-line "250-…\n250 " continuations).
      def reply(expect: Int): Unit = {
        var line = in.readLine()
        if (line == null) sys.error("SMTP server closed the connection")
        val first = line
        // a null mid-continuation (server hung up between "250-" lines)
        // must surface as the connection error, not an NPE
        while (line != null && line.length >= 4 && line.charAt(3) == '-')
          line = in.readLine()
        if (line == null) sys.error("SMTP server closed the connection mid-reply")
        val code = first.take(3)
        if (code != expect.toString)
          sys.error(s"SMTP expected $expect, got: $first")
      }
      def cmd(s: String, expect: Int): Unit = {
        out.print(s + "\r\n"); out.flush(); reply(expect)
      }

      reply(220)
      cmd("HELO graft.localdomain", 250)
      cmd(s"MAIL FROM:<${msg.from}>", 250)
      msg.to.foreach(rcpt => cmd(s"RCPT TO:<$rcpt>", 250))
      cmd("DATA", 354)

      val date = ZonedDateTime.now(ZoneOffset.UTC)
        .format(DateTimeFormatter.RFC_1123_DATE_TIME.withLocale(Locale.ROOT))
      val headers = Seq(
        s"From: ${msg.from}",
        s"To: ${msg.to.mkString(", ")}",
        s"Subject: $subject",
        s"Date: $date",
        "MIME-Version: 1.0",
        "Content-Type: text/html; charset=utf-8")
      val body = msg.htmlContent.linesIterator
        .map(l => if (l.startsWith(".")) "." + l else l) // dot-stuffing
        .mkString("\r\n")
      out.print(headers.mkString("", "\r\n", "\r\n") + "\r\n" + body + "\r\n.\r\n")
      out.flush()
      reply(250)
      cmd("QUIT", 221)
    } finally socket.close()
  }

  private def sanitizeHeader(s: String): String = {
    require(!s.exists(c => c == '\r' || c == '\n'), s"newline in header: $s")
    s
  }
}
