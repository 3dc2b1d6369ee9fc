package graft

import java.net.InetSocketAddress
import com.sun.net.httpserver.HttpServer
import graft.sources.Http

/** HTTP GET source (SURVEY.md §2.1 S2/S3) against a loopback server —
  * a real HTTP round-trip with zero egress. */
class HttpSpec extends SparkSpec {

  private def withServer(body: String)(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/data", exchange => {
      val bytes = body.getBytes("UTF-8")
      val code = if (exchange.getRequestURI.getQuery == "fail=1") 500 else 200
      exchange.sendResponseHeaders(code, bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/data")
    finally server.stop(0)
  }

  test("getJson parses a JSON array into rows with a declared schema") {
    val payload =
      """[{"station": 100, "pm25": 12.5, "time": "2024-01-01T00:00:00"},
         |{"station": 101, "pm25": 8.1, "time": "2024-01-01T01:00:00"}]""".stripMargin
    withServer(payload) { url =>
      val df = Http.getJson(spark, url,
        schemaDdl = Some("station INT, pm25 DOUBLE, time TIMESTAMP"))
      val rows = df.collect()
      assert(rows.length == 2)
      assert(df.schema.map(_.dataType.typeName) == Seq("integer", "double", "timestamp"))
      assert(rows.map(_.getInt(0)).toSet == Set(100, 101))
    }
  }

  test("query params are encoded and appended") {
    withServer("""{"ok": true}""") { url =>
      val body = Http.get(url, Map("q" -> "a b", "n" -> "1"))
      assert(body.contains("ok"))
    }
  }

  test("non-2xx fails loudly (raise_for_status semantics)") {
    withServer("boom") { url =>
      val e = intercept[IllegalArgumentException](Http.get(url, Map("fail" -> "1")))
      assert(e.getMessage.contains("500"))
    }
  }
}
