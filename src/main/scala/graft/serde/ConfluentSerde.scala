package graft.serde

import graft.core.GraftError
import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** The Confluent Schema Registry wire format
  * (ref: tamer `core/src/main/scala/tamer/Serde.scala:31-87`):
  * one magic byte 0x00, a big-endian int32 schema id, then the Avro binary
  * body. Subject naming is `"$topic-key"` / `"$topic-value"`
  * (`Serde.scala:41`).
  */
object ConfluentWire {
  final val Magic: Byte = 0x0
  final val HeaderSize = 5

  def subject(topic: String, isKey: Boolean): String =
    s"$topic-${if (isKey) "key" else "value"}"

  def encode(schemaId: Int, payload: Array[Byte]): Array[Byte] =
    ByteBuffer.allocate(HeaderSize + payload.length)
      .put(Magic).putInt(schemaId).put(payload).array()

  /** Split a framed message into (schemaId, payload); rejects bad magic. */
  def decode(data: Array[Byte]): (Int, Array[Byte]) = {
    if (data.length < HeaderSize) throw GraftError(s"Deserialization failed: ${data.length} bytes is shorter than the wire header")
    val buffer = ByteBuffer.wrap(data)
    if (buffer.get() != Magic) throw GraftError("Deserialization failed: unknown magic byte!")
    val id = buffer.getInt()
    val payload = new Array[Byte](data.length - HeaderSize)
    buffer.get(payload)
    (id, payload)
  }
}

/** Registry-backed Avro serde over [[ConfluentWire]]:
  *  - serialize: resolve-or-register the schema id for the subject, frame
  *    the Avro binary body behind the 5-byte header;
  *  - deserialize: check magic, fetch the *writer* schema by the embedded
  *    id, verify reader compatibility (incompatibility is fatal, as in the
  *    reference — `Registry.scala:111-117`), then decode with full Avro
  *    schema resolution (writer → reader), so added-with-default /
  *    reordered / narrowed-alias evolutions read correctly.
  */
final class ConfluentAvroSerde(registry: SchemaRegistry) {

  def serialize(topic: String, isKey: Boolean, record: GenericRecord): Array[Byte] = {
    val schema = record.getSchema
    val id = registry.getOrRegisterId(ConfluentWire.subject(topic, isKey), schema)
    val baos = new ByteArrayOutputStream()
    val encoder = EncoderFactory.get().binaryEncoder(baos, null)
    new GenericDatumWriter[GenericRecord](schema).write(record, encoder)
    encoder.flush()
    ConfluentWire.encode(id, baos.toByteArray)
  }

  def deserialize(data: Array[Byte], reader: Schema): GenericRecord = {
    val (id, payload) = ConfluentWire.decode(data)
    registry.verifySchema(id, reader)
    val writer = registry.getSchemaById(id)
    val decoder = DecoderFactory.get().binaryDecoder(payload, null)
    new GenericDatumReader[GenericRecord](writer, reader).read(null, decoder)
  }
}

/** DataFrame-level Confluent-Avro serde for FLAT record schemas (the
  * reference's observed usage is flat records of primitives — SURVEY.md
  * §1.2): serialize the named fields of every row into a framed
  * `magic ‖ id ‖ avro-binary` column, and decode such a column back into
  * typed fields. Runs per-partition (serde + registry instantiated once per
  * partition from the serializable schema JSON), so record bytes never
  * visit the driver — the exact shape a Kafka-bound `foreachBatch` uses.
  *
  * Supported field types: boolean, int, long, float, double, string.
  */
object ConfluentAvroFrames {
  import org.apache.spark.sql.{DataFrame, Row}
  import org.apache.spark.sql.catalyst.encoders.RowEncoder
  import org.apache.spark.sql.types._

  private def sparkType(f: Schema.Field): DataType = f.schema().getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT     => IntegerType
    case Schema.Type.LONG    => LongType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.STRING  => StringType
    case t => throw GraftError(s"unsupported flat-record avro field type: $t")
  }

  /** Per-partition registry: executors cannot share a driver-side client
    * object, so implementations travel as a serializable FACTORY — the
    * default builds a fresh in-memory registry (self-contained wires, ids
    * start at 1); a deployment passes `() => new MySrRestRegistry(url)`
    * and the embedded ids then come from the shared service. */
  type RegistryFactory = () => SchemaRegistry

  /** (df's columns matching the schema's field names) -> one `wire` binary
    * column. Columns are CAST to the schema's types up front, so a type
    * mismatch fails analysis with the field name — not as a per-row
    * ClassCastException inside the avro writer. Null values are rejected
    * per-field BY NAME: flat schemas have no null union, so letting a null
    * reach the avro writer would NPE deep inside GenericDatumWriter with no
    * hint of which column was at fault. */
  def serialize(
      df: DataFrame,
      topic: String,
      isKey: Boolean,
      schemaJson: String,
      registryFactory: RegistryFactory = () => new InMemorySchemaRegistry
  ): DataFrame = {
    val fields = new Schema.Parser().parse(schemaJson).getFields.asScala.toSeq
    val fieldNames = fields.map(_.name)
    val out = StructType(Seq(StructField("wire", BinaryType, nullable = false)))
    val enc = RowEncoder.encoderFor(out)
    df.select(fields.map(f => col(f.name).cast(sparkType(f))): _*).mapPartitions { rows =>
      val schema = new Schema.Parser().parse(schemaJson)
      val serde = new ConfluentAvroSerde(registryFactory())
      rows.map { r =>
        val rec = new org.apache.avro.generic.GenericData.Record(schema)
        fieldNames.zipWithIndex.foreach { case (n, i) =>
          if (r.isNullAt(i))
            throw GraftError(s"Serialization failed: null value in field '$n' (schema has no null union)")
          rec.put(n, r.get(i))
        }
        Row(serde.serialize(topic, isKey, rec))
      }
    }(enc)
  }

  /** Framed binary column -> the input columns with one typed column PER
    * reader-schema field appended. Verifies magic + reader compatibility per
    * record, with full Avro writer->reader schema resolution — pass
    * `writerSchemaJson` when the wire was written with an OLDER schema
    * version (added-with-default / reordered fields resolve per Avro rules).
    */
  def deserialize(
      df: DataFrame,
      wireCol: String,
      topic: String,
      isKey: Boolean,
      schemaJson: String,
      writerSchemaJson: Option[String] = None,
      registryFactory: Option[RegistryFactory] = None
  ): DataFrame = {
    val reader = new Schema.Parser().parse(schemaJson)
    val out = StructType(
      df.schema.fields ++ reader.getFields.asScala.map(f => StructField(f.name, sparkType(f))))
    val enc = RowEncoder.encoderFor(out)
    val nFields = reader.getFields.size
    val wireIdx = df.schema.fieldIndex(wireCol)
    val writerJson = writerSchemaJson.getOrElse(schemaJson)
    df.mapPartitions { rows =>
      val readerSchema = new Schema.Parser().parse(schemaJson)
      val registry = registryFactory match {
        // shared registry: the wire's embedded ids already resolve there
        case Some(factory) => factory()
        // self-contained wire (written by the default serialize above):
        // pre-register the writer schema so the embedded id 1 resolves
        case None =>
          val r = new InMemorySchemaRegistry
          r.getOrRegisterId(ConfluentWire.subject(topic, isKey),
            new Schema.Parser().parse(writerJson))
          r
      }
      val serde = new ConfluentAvroSerde(registry)
      rows.map { r =>
        val rec = serde.deserialize(r.getAs[Array[Byte]](wireIdx), readerSchema)
        Row.fromSeq(r.toSeq ++ (0 until nFields).map { i =>
          rec.get(i) match {
            case u: org.apache.avro.util.Utf8 => u.toString
            case v                            => v
          }
        })
      }
    }(enc)
  }
}

/** Column-level wire-format plumbing, for pipelines whose payloads are
  * already Avro binary (or any binary) in a DataFrame: pure codegen'd
  * expressions, no UDFs.
  */
object ConfluentWireColumns {

  /** Frame a binary column: magic byte + big-endian id + payload. */
  def withWireHeader(payload: Column, schemaId: Int): Column = {
    val header = ByteBuffer.allocate(ConfluentWire.HeaderSize).put(ConfluentWire.Magic).putInt(schemaId).array()
    concat(lit(header), payload)
  }

  /** The Avro body of a framed message (bytes after the 5-byte header). */
  def wirePayload(framed: Column): Column =
    substring(framed, ConfluentWire.HeaderSize + 1, Int.MaxValue)

  /** The embedded schema id of a framed message (big-endian int32 at
    * offset 1). */
  def wireSchemaId(framed: Column): Column =
    conv(hex(substring(framed, 2, 4)), 16, 10).cast("int")

  /** True iff the first byte is the Confluent magic byte. */
  def hasWireMagic(framed: Column): Column =
    substring(framed, 1, 1) === lit(Array(ConfluentWire.Magic))
}
