package graft

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentHashMap
import com.sun.net.httpserver.HttpServer
import org.apache.spark.sql.functions._

/** DataSource V2 HTTP table ([[graft.sources.HttpBatchSource]]): each
  * page is an InputPartition fetched on executor threads — proven here
  * against a loopback server that records which pages were hit.
  */
class HttpSourceSpec extends SparkSpec {

  /** Paged server: /page/N returns a 3-row JSON array; records hits. */
  private def withPagedServer(pages: Int)(f: (String, ConcurrentHashMap[String, Integer]) => Unit): Unit = {
    val hits = new ConcurrentHashMap[String, Integer]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/page", exchange => {
      val page = exchange.getRequestURI.getPath.stripPrefix("/page/").toInt
      hits.merge(page.toString, 1, (a, b) => a + b)
      val rows = (0 until 3).map { i =>
        val id = page * 3 + i
        s"""{"id": $id, "name": "row$id", "score": ${id * 1.5}, "ok": ${id % 2 == 0}}"""
      }
      val body = rows.mkString("[", ",", "]").getBytes("UTF-8")
      exchange.sendResponseHeaders(200, body.length)
      exchange.getResponseBody.write(body)
      exchange.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/page/{page}", hits)
    finally server.stop(0)
  }

  test("one partition per page; rows typed per schema; all pages fetched") {
    withPagedServer(pages = 4) { (template, hits) =>
      val df = spark.read.format("graft.sources.HttpBatchSource")
        .option("urlTemplate", template)
        .option("pages", "4")
        .schema("id LONG, name STRING, score DOUBLE, ok BOOLEAN")
        .load()
      assert(df.rdd.getNumPartitions == 4, "one InputPartition per page")
      val rows = df.orderBy("id").collect()
      assert(rows.length == 12)
      assert(rows.map(_.getLong(0)).toSeq == (0L until 12L))
      assert(rows(3).getString(1) == "row3")
      assert(rows(4).getDouble(2) == 6.0)
      assert(rows(6).getBoolean(3))
      assert(hits.size() == 4, s"pages hit: $hits")
      // relational ops compose over the source like any other table
      val agg = spark.read.format("graft.sources.HttpBatchSource")
        .option("urlTemplate", template).option("pages", "4")
        .schema("id LONG, name STRING, score DOUBLE, ok BOOLEAN")
        .load()
        .filter(col("ok")).agg(sum(col("id")).as("s")).head().getLong(0)
      assert(agg == (0L until 12L).filter(_ % 2 == 0).sum)
    }
  }

  test("missing fields become nulls; explicit schema is required") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/page", exchange => {
      val body = """[{"id": 1}, {"id": 2, "name": "two"}]""".getBytes("UTF-8")
      exchange.sendResponseHeaders(200, body.length)
      exchange.getResponseBody.write(body)
      exchange.close()
    })
    server.start()
    try {
      val template = s"http://127.0.0.1:${server.getAddress.getPort}/page/{page}"
      val df = spark.read.format("graft.sources.HttpBatchSource")
        .option("urlTemplate", template).option("pages", "1")
        .schema("id LONG, name STRING").load()
      val rows = df.orderBy("id").collect()
      assert(rows(0).isNullAt(1) && rows(1).getString(1) == "two")
      intercept[IllegalArgumentException] {
        spark.read.format("graft.sources.HttpBatchSource")
          .option("urlTemplate", template).option("pages", "1").load()
      }
    } finally server.stop(0)
  }

  test("LONG coercion requires integrality: 1.0 parses, 1.9 fails loudly") {
    def serve(body: String)(f: String => Unit): Unit = {
      val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/page", exchange => {
        val bytes = body.getBytes("UTF-8")
        exchange.sendResponseHeaders(200, bytes.length)
        exchange.getResponseBody.write(bytes)
        exchange.close()
      })
      server.start()
      try f(s"http://127.0.0.1:${server.getAddress.getPort}/page/{page}")
      finally server.stop(0)
    }
    def read(template: String) =
      spark.read.format("graft.sources.HttpBatchSource")
        .option("urlTemplate", template).option("pages", "1")
        .schema("id LONG").load()
    serve("""[{"id": 1.0}, {"id": 2}]""") { template =>
      assert(read(template).orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    }
    serve("""[{"id": 1.9}]""") { template =>
      // canConvertToLong alone would silently truncate 1.9 → 1
      val e = intercept[Exception] { read(template).collect() }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("cannot coerce")), s"got: $e")
    }
  }
}
