package graft.serde

import graft.core.GraftError
import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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
