package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructType, BooleanType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S2 at scale: a DataSource V2 HTTP table — the parallel-fetch form
  * SURVEY §2.1 marks `[implied]` next to the reference's driver-side
  * `requests.get` (`dags/tutorial_objectstorage.py:78-99`). Each page
  * of a paged JSON API becomes one `InputPartition`, so the fetches
  * run ON EXECUTORS, in parallel, with Spark's task retry semantics —
  * the difference between pulling one day of data through the driver
  * and pulling a year through the cluster.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.HttpBatchSource")
  *   .option("urlTemplate", "https://api/page/{page}")   // {page} ∈ [0, pages)
  *   .option("pages", "12")
  *   .schema("id LONG, name STRING, score DOUBLE")        // required
  *   .load()
  * }}}
  *
  * Each page must return a JSON array of flat objects; fields are
  * extracted by schema name (missing → null) and coerced to the
  * declared LONG/DOUBLE/STRING/BOOLEAN type. Parsing uses Jackson
  * (already on Spark's classpath) per partition — no driver hop.
  * HttpSourceSpec drives it against a loopback server and proves the
  * partition count and the executor-side fetch path.
  */
class HttpBatchSource extends TableProvider {
  // schema must be user-supplied (.schema(...)): inference would need a
  // driver-side probe fetch, exactly what this source exists to avoid.
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "HttpBatchSource requires an explicit .schema(...)")

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // properties arrive case-preserving; match options case-insensitively
    val opts = new CaseInsensitiveStringMap(properties)
    new HttpTable(schema, opts.get("urltemplate"),
      Option(opts.get("pages")).map(_.toInt).getOrElse(1))
  }
}

final class HttpTable(tableSchema: StructType, urlTemplate: String, pages: Int)
    extends Table with SupportsRead {
  require(urlTemplate != null && urlTemplate.contains("{page}"),
    "urlTemplate option with a {page} placeholder is required")
  require(pages > 0, "pages must be positive")

  override def name(): String = s"http($urlTemplate)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = tableSchema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        Array.tabulate(pages)(p => HttpPagePartition(
          urlTemplate.replace("{page}", p.toString)))
      override def createReaderFactory(): PartitionReaderFactory =
        new HttpReaderFactory(tableSchema)
    }
}

final case class HttpPagePartition(url: String) extends InputPartition

/** Runs on executors: one HTTP GET + JSON-array parse per partition. */
final class HttpReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val url = partition.asInstanceOf[HttpPagePartition].url
    new PartitionReader[InternalRow] {
      private lazy val rows: Iterator[InternalRow] = {
        val body = Http.get(url)
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val root = mapper.readTree(body)
        require(root.isArray, s"$url did not return a JSON array")
        val it = root.elements()
        new Iterator[com.fasterxml.jackson.databind.JsonNode] {
          def hasNext = it.hasNext
          def next() = it.next()
        }.map(toRow).iterator
      }
      private var current: InternalRow = _

      private def toRow(node: com.fasterxml.jackson.databind.JsonNode): InternalRow = {
        val values = schema.fields.map { f =>
          val v = node.get(f.name)
          if (v == null || v.isNull) null
          else coerce(v, f.dataType, f.name)
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }

      // STRICT coercion: Jackson's lenient asLong()/asDouble()/
      // asBoolean() return 0/0.0/false for non-coercible values, which
      // silently corrupts a page carrying "id": "abc" into id = 0.
      // Non-coercible values fail loudly with the field name; numeric
      // STRINGS still parse (APIs routinely quote numbers).
      private def coerce(v: com.fasterxml.jackson.databind.JsonNode,
          dt: DataType, field: String): Any = dt match {
        // canConvertToLong alone checks only RANGE on floating nodes —
        // "id": 1.9 would silently truncate to 1; require integrality.
        case LongType if v.canConvertToLong &&
            (v.isIntegralNumber || v.asDouble() == math.floor(v.asDouble())) =>
          v.asLong()
        case LongType if v.isTextual =>
          try v.asText().trim.toLong
          catch { case _: NumberFormatException => badValue(v, dt, field) }
        case DoubleType if v.isNumber => v.asDouble()
        case DoubleType if v.isTextual =>
          try v.asText().trim.toDouble
          catch { case _: NumberFormatException => badValue(v, dt, field) }
        case StringType  => UTF8String.fromString(v.asText())
        case BooleanType if v.isBoolean => v.asBoolean()
        case BooleanType if v.isTextual &&
            Set("true", "false")(v.asText().trim.toLowerCase) =>
          v.asText().trim.toLowerCase == "true"
        case LongType | DoubleType | BooleanType => badValue(v, dt, field)
        case other => throw new IllegalArgumentException(
          s"HttpBatchSource: unsupported type $other for field $field " +
            "(supported: LONG, DOUBLE, STRING, BOOLEAN)")
      }

      private def badValue(v: com.fasterxml.jackson.databind.JsonNode,
          dt: DataType, field: String): Nothing =
        throw new IllegalArgumentException(
          s"HttpBatchSource: cannot coerce ${v.getNodeType} value " +
            s"'${v.asText()}' to $dt for field $field")

      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
