package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import org.apache.spark.sql.{DataFrame, SparkSession}

/** HTTP GET source (SURVEY.md §2.1 S2/S3): fetch JSON over HTTP on the
  * driver, parallelize into a DataFrame with schema inference or a
  * declared schema.
  *
  * Mirrors the reference's FMI/httpbin fetches
  * (`dags/tutorial_objectstorage.py:78-99`,
  * `dags/example_dag_decorator.py:33-41`): the fetch is a driver-side
  * act (one API call per pipeline run — parallelizing it buys nothing),
  * and the *result* becomes distributed data. For genuinely large HTTP
  * pulls (many pages/shards) the scale path is a `Dataset[Request]` of
  * work items + `mapPartitions` fetch on executors — same pattern as
  * [[graft.operators.Multimodal.decode]].
  */
object Http {

  private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10)).build()

  /** GET a URL, return the body; non-2xx is an error (the reference
    * relies on `requests`' raise_for_status semantics). */
  def get(url: String, params: Map[String, String] = Map.empty): String = {
    val full =
      if (params.isEmpty) url
      else url + "?" + params.map { case (k, v) =>
        java.net.URLEncoder.encode(k, "UTF-8") + "=" + java.net.URLEncoder.encode(v, "UTF-8")
      }.mkString("&")
    // response timeout too, not just connect: a server that accepts
    // the connection and never responds would otherwise block the
    // executor task (or the driver, in pipeline tasks) forever
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(full)).GET()
        .timeout(Duration.ofSeconds(60)).build(),
      HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() / 100 == 2, s"HTTP ${resp.statusCode()} for $full")
    resp.body()
  }

  /** GET a JSON document and parse it into a DataFrame (one row per
    * top-level array element, or a single row for an object).
    * Schema is inferred unless `schemaDdl` pins it — declared schemas
    * are the production path (inference is nondeterministic across
    * payloads; the reference pins dtypes too,
    * `dags/tutorial_objectstorage.py:32-43,99`). */
  def getJson(spark: SparkSession, url: String,
      params: Map[String, String] = Map.empty,
      schemaDdl: Option[String] = None): DataFrame = {
    import spark.implicits._
    val body = get(url, params)
    val ds = spark.createDataset(Seq(body))
    val reader = schemaDdl.fold(spark.read)(d => spark.read.schema(d))
    reader.json(ds)
  }
}
