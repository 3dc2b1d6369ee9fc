package graft

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Smtp

/** Loopback SMTP server (same pattern as HttpSpec): accepts one
  * connection, speaks minimal RFC 5321, records the full dialogue so
  * the client's commands, headers, dot-stuffing and recipients can be
  * asserted exactly.
  */
class SmtpSpec extends AnyFunSuite {

  /** Run a one-shot server; returns (port, futureDialogue). */
  private def withServer(test: Int => Unit): (Seq[String], String) = {
    val server = new ServerSocket(0)
    val commands = scala.collection.mutable.ArrayBuffer.empty[String]
    val data = new StringBuilder
    val t = new Thread(() => {
      val s = server.accept()
      val in = new BufferedReader(new InputStreamReader(
        s.getInputStream, StandardCharsets.UTF_8))
      val out = new PrintWriter(s.getOutputStream, false)
      def say(l: String): Unit = { out.print(l + "\r\n"); out.flush() }
      say("220 loopback ESMTP")
      var inData = false
      var done = false
      while (!done) {
        val line = in.readLine()
        if (line == null) done = true
        else if (inData) {
          if (line == ".") { inData = false; say("250 OK stored") }
          else data.append(line).append('\n')
        } else {
          commands += line
          val u = line.toUpperCase
          if (u.startsWith("HELO")) say("250-loopback greets you\r\n250 OK")
          else if (u.startsWith("MAIL FROM") || u.startsWith("RCPT TO")) say("250 OK")
          else if (u == "DATA") { inData = true; say("354 go ahead") }
          else if (u == "QUIT") { say("221 bye"); done = true }
          else say("500 what")
        }
      }
      s.close()
    })
    t.start()
    try test(server.getLocalPort)
    finally { t.join(5000); server.close() }
    (commands.toSeq, data.toString)
  }

  test("delivers headers, recipients, html body with dot-stuffing") {
    val msg = Smtp.Message(
      from = "graft@localhost",
      to = Seq("a@example.com", "b@example.com"),
      subject = "pipeline finished",
      htmlContent = "<p>total 1236.70</p>\n.leading dot line")
    val (commands, data) = withServer { port =>
      Smtp.send("127.0.0.1", port, msg)
    }
    assert(commands.head.startsWith("HELO"))
    assert(commands.contains("MAIL FROM:<graft@localhost>"))
    assert(commands.contains("RCPT TO:<a@example.com>"))
    assert(commands.contains("RCPT TO:<b@example.com>"))
    assert(commands.last == "QUIT")
    assert(data.contains("Subject: pipeline finished"))
    assert(data.contains("Content-Type: text/html; charset=utf-8"))
    assert(data.contains("<p>total 1236.70</p>"))
    // client dot-stuffed; the server's DATA loop sees "..leading"
    assert(data.contains("..leading dot line"))
    assert(data.contains("To: a@example.com, b@example.com"))
  }

  test("notifier adapts Notifier surface to SMTP") {
    val (commands, data) = withServer { port =>
      graft.sources.Smtp.notifier("127.0.0.1", port)
        .notify("ops@example.com", "sla missed", "<b>late</b>")
    }
    assert(commands.contains("RCPT TO:<ops@example.com>"))
    assert(data.contains("Subject: sla missed") && data.contains("<b>late</b>"))
  }

  test("pipeline SLA miss delivers mail through the SMTP notifier") {
    // The reference combines these as EmailOperator + sla_miss_callback
    // (dags/example_dag_decorator.py:69-71, dags/example_sla_dag.py:30-61);
    // here the engine's C16 hook drives the real S10 sink end-to-end.
    import graft.pipeline.Pipeline
    import graft.pipeline.Pipeline._
    val (commands, data) = withServer { port =>
      val n = graft.sources.Smtp.notifier("127.0.0.1", port)
      val listener = new Pipeline.Listener {
        override def onSlaMiss(task: String, elapsedMs: Long, slaMs: Long): Unit =
          n.notify("ops@example.com", s"SLA missed: $task",
            s"<p>$task exceeded ${slaMs}ms</p>")
      }
      val r = Pipeline.run(
        Seq(Task("slow", _ => { Thread.sleep(20); Value(()) })),
        listener = listener, slaMs = Map("slow" -> 1L))
      assert(r.status("slow") == Success)
    }
    assert(commands.contains("RCPT TO:<ops@example.com>"))
    assert(data.contains("Subject: SLA missed: slow"))
    assert(data.contains("<p>slow exceeded 1ms</p>"))
  }

  test("address injection is rejected before any connection") {
    intercept[IllegalArgumentException] {
      Smtp.send("127.0.0.1", 1,
        Smtp.Message("a@b", Seq("x@y\r\nRCPT TO:<evil@z>"), "s", "b"))
    }
    intercept[IllegalArgumentException] {
      Smtp.send("127.0.0.1", 1,
        Smtp.Message("a@b", Seq("x@y"), "s\nX-Injected: 1", "b"))
    }
  }
}
