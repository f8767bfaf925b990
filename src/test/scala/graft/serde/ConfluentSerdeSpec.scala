package graft.serde

import graft.core.GraftError
import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.generic.GenericRecordBuilder
import org.scalatest.funsuite.AnyFunSuite

/** Wire-format byte fixtures + evolution semantics
  * (ref: tamer `core/src/main/scala/tamer/Serde.scala:31-87`,
  * `core/src/main/scala/tamer/Registry.scala:111-136`).
  */
class ConfluentSerdeSpec extends AnyFunSuite {

  private val v1: Schema = SchemaBuilder.record("T").fields()
    .requiredInt("x").endRecord()
  private val v2: Schema = SchemaBuilder.record("T").fields()
    .requiredInt("x").name("y").`type`().stringType().stringDefault("dflt").endRecord()
  private val incompatible: Schema = SchemaBuilder.record("T").fields()
    .requiredString("x").endRecord()

  private def rec(x: Int) = new GenericRecordBuilder(v1).set("x", x).build()

  test("wire format: magic 0x00, big-endian int32 id, avro body") {
    val registry = new InMemorySchemaRegistry
    val serde = new ConfluentAvroSerde(registry)
    val bytes = serde.serialize("topic", isKey = false, rec(7))
    val id = registry.getOrRegisterId("topic-value", v1)
    assert(bytes(0) == 0x0)
    assert(java.nio.ByteBuffer.wrap(bytes, 1, 4).getInt == id)
    // avro zig-zag varint of 7 is 0x0e
    assert(bytes.drop(5).toSeq == Seq(0x0e.toByte))
  }

  test("subject naming is topic-key / topic-value") {
    assert(ConfluentWire.subject("t", isKey = true) == "t-key")
    assert(ConfluentWire.subject("t", isKey = false) == "t-value")
  }

  test("round-trip: serialize then deserialize with the same schema") {
    val serde = new ConfluentAvroSerde(new InMemorySchemaRegistry)
    val out = serde.deserialize(serde.serialize("t", isKey = false, rec(42)), v1)
    assert(out.get("x") == 42)
  }

  test("schema evolution: v2 reader gets the default for the added field") {
    val serde = new ConfluentAvroSerde(new InMemorySchemaRegistry)
    val out = serde.deserialize(serde.serialize("t", isKey = false, rec(1)), v2)
    assert(out.get("x") == 1)
    assert(out.get("y").toString == "dflt")
  }

  test("incompatible reader fails loudly (pipeline abort semantics)") {
    val serde = new ConfluentAvroSerde(new InMemorySchemaRegistry)
    val bytes = serde.serialize("t", isKey = false, rec(1))
    val err = intercept[GraftError](serde.deserialize(bytes, incompatible))
    assert(err.getMessage.contains("incompatible"))
  }

  test("bad magic byte and truncated input are rejected") {
    val serde = new ConfluentAvroSerde(new InMemorySchemaRegistry)
    val good = serde.serialize("t", isKey = false, rec(1))
    val badMagic = good.clone(); badMagic(0) = 1
    assert(intercept[GraftError](serde.deserialize(badMagic, v1)).getMessage.contains("magic"))
    assert(intercept[GraftError](serde.deserialize(Array[Byte](0, 0), v1)).getMessage.contains("shorter"))
  }

  test("same schema registers once; different subjects get distinct ids") {
    val registry = new InMemorySchemaRegistry
    val a = registry.getOrRegisterId("s1", v1)
    assert(registry.getOrRegisterId("s1", v1) == a)
    assert(registry.getOrRegisterId("s2", v1) != a)
  }

  test("caching registry memoizes lookups and verifications") {
    var lookups = 0
    val counting = new SchemaRegistry {
      val inner = new InMemorySchemaRegistry
      def getOrRegisterId(subject: String, schema: Schema): Int = { lookups += 1; inner.getOrRegisterId(subject, schema) }
      def getSchemaById(id: Int): Schema = { lookups += 1; inner.getSchemaById(id) }
    }
    val cached = new CachingSchemaRegistry(counting)
    val serde = new ConfluentAvroSerde(cached)
    val bytes = serde.serialize("t", isKey = false, rec(1))
    (1 to 10).foreach(_ => serde.deserialize(bytes, v1))
    (1 to 10).foreach(_ => serde.serialize("t", isKey = false, rec(2)))
    assert(lookups == 2) // one id resolve + one schema fetch, everything else cached
  }

  test("column-level framing round-trips in a DataFrame") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5)).toDF("payload")
    val framed = df.select(ConfluentWireColumns.withWireHeader(col("payload"), 77).as("framed"))
    val back = framed.select(
      ConfluentWireColumns.wireSchemaId(col("framed")).as("id"),
      ConfluentWireColumns.wirePayload(col("framed")).as("payload"),
      ConfluentWireColumns.hasWireMagic(col("framed")).as("magic"))
      .collect()
    assert(back.forall(_.getInt(0) == 77))
    assert(back.forall(_.getBoolean(2)))
    assert(back.map(_.getAs[Array[Byte]](1).toSeq).toSet == Set(Seq[Byte](1, 2, 3), Seq[Byte](4, 5)))
  }

  test("DataFrame avro serde round-trips flat records per partition") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val schemaJson =
      """{"type":"record","name":"U","fields":[
        |{"name":"id","type":"long"},{"name":"name","type":"string"},{"name":"score","type":"double"}]}""".stripMargin
    val df = Seq((1L, "ann", 0.5), (2L, "bob", 1.25)).toDF("id", "name", "score")
    val wire = ConfluentAvroFrames.serialize(df, "users", isKey = false, schemaJson)
    val back = ConfluentAvroFrames.deserialize(wire, "wire", "users", isKey = false, schemaJson)
      .select("id", "name", "score").as[(Long, String, Double)].collect().sorted.toSeq
    assert(back == Seq((1L, "ann", 0.5), (2L, "bob", 1.25)))
  }

  test("DataFrame avro serde names the null field instead of NPEing in the writer") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val schemaJson =
      """{"type":"record","name":"U","fields":[
        |{"name":"id","type":"long"},{"name":"name","type":"string"}]}""".stripMargin
    val df = Seq((1L, "ann"), (2L, null: String)).toDF("id", "name")
    val e = intercept[org.apache.spark.SparkException] {
      ConfluentAvroFrames.serialize(df, "users", isKey = false, schemaJson).collect()
    }
    assert(e.getMessage.contains("'name'") || Option(e.getCause).exists(_.getMessage.contains("'name'")))
  }

  test("DataFrame avro serde: v2 reader over v1 wire gets the added default") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val v1Json = """{"type":"record","name":"U","fields":[{"name":"id","type":"long"}]}"""
    val v2Json =
      """{"type":"record","name":"U","fields":[
        |{"name":"id","type":"long"},{"name":"tag","type":"string","default":"dflt"}]}""".stripMargin
    val wire = ConfluentAvroFrames.serialize(Seq(7L).toDF("id"), "users", isKey = false, v1Json)
    val back = ConfluentAvroFrames.deserialize(
        wire, "wire", "users", isKey = false, v2Json, writerSchemaJson = Some(v1Json))
      .select("id", "tag").as[(Long, String)].collect().toSeq
    assert(back == Seq((7L, "dflt")))
  }
}
