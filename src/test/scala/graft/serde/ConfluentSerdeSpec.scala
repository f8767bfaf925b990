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

  test("serializeAppend keeps the carrier columns alongside the wire") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val schemaJson = """{"type":"record","name":"U","fields":[{"name":"id","type":"long"}]}"""
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
    val out = ConfluentAvroFrames.serializeAppend(df, "t", isKey = false, schemaJson)
    assert(out.columns.toSeq == Seq("id", "tag", "wire"))
    val rows = out.collect()
    assert(rows.map(_.getString(1)).sorted.toSeq == Seq("a", "b"))
    assert(rows.forall(_.getAs[Array[Byte]](2)(0) == 0x0))
  }

  private val dlqSchemaJson =
    """{"type":"record","name":"U","fields":[
      |{"name":"name","type":"string"},{"name":"score","type":"double"}]}""".stripMargin

  /** One wire per corruption class + clean rows, keyed by a carrier id. */
  private def dlqFixture(spark: org.apache.spark.sql.SparkSession) = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, substring, concat, lit, when}
    val clean = ConfluentAvroFrames.serializeAppend(
      Seq((1L, "ann", 0.5), (2L, "bob", 1.25), (3L, "cec", 2.0), (4L, "dee", 3.5), (5L, "eve", 4.0))
        .toDF("rid", "name", "score"),
      "t", isKey = false, dlqSchemaJson)
    clean.select(col("rid"),
      when(col("rid") === 2, concat(lit(Array(0x7f.toByte)), substring(col("wire"), 2, Int.MaxValue)))
        .when(col("rid") === 3, substring(col("wire"), 1, 2))
        .when(col("rid") === 4, ConfluentWireColumns.withWireHeader(ConfluentWireColumns.wirePayload(col("wire")), 123))
        .when(col("rid") === 5, substring(col("wire"), 1, ConfluentWire.HeaderSize + 1))
        .otherwise(col("wire")).as("wire"))
  }

  test("deserializeTagged routes each corruption class with its reason; clean rows decode") {
    val spark = graft.TestSpark.spark
    val out = ConfluentAvroFrames.deserializeTagged(
        dlqFixture(spark), "wire", "t", isKey = false, dlqSchemaJson)
      .select("rid", "name", "score", "is_dead", "dead_reason")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "ann" && out(1L).getDouble(2) == 0.5 && !out(1L).getBoolean(3))
    assert(out(1L).isNullAt(4))
    assert(out(2L).getString(4) == "bad_magic")
    assert(out(3L).getString(4) == "short_header")
    assert(out(4L).getString(4) == "unknown_schema_id")
    assert(out(5L).getString(4) == "malformed_body")
    Seq(2L, 3L, 4L, 5L).foreach { k =>
      assert(out(k).getBoolean(3) && out(k).isNullAt(1) && out(k).isNullAt(2))
    }
  }

  test("deserializeTagged: null wire is a tombstone — good row, null fields") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val df = Seq((1L, Option.empty[Array[Byte]])).toDF("rid", "wire")
    val r = ConfluentAvroFrames.deserializeTagged(df, "wire", "t", isKey = false, dlqSchemaJson)
      .select("rid", "name", "score", "is_dead", "dead_reason")
      .collect().head
    assert(!r.getBoolean(3) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(4))
  }

  test("deserializeTagged decodes clean rows identically to the FAILFAST path") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val wire = ConfluentAvroFrames.serializeAppend(
      Seq((1L, "ann", 0.5), (2L, "bob", 1.25)).toDF("rid", "name", "score"),
      "t", isKey = false, dlqSchemaJson).select("rid", "wire")
    val strict = ConfluentAvroFrames.deserialize(wire, "wire", "t", isKey = false, dlqSchemaJson)
      .select("rid", "name", "score").collect().map(_.toSeq).toSet
    val tagged = ConfluentAvroFrames.deserializeTagged(wire, "wire", "t", isKey = false, dlqSchemaJson)
      .select("rid", "name", "score").collect().map(_.toSeq).toSet
    assert(strict == tagged)
  }

  test("deserializeTagged: reader incompatibility with a KNOWN id stays fatal") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val v1Json = """{"type":"record","name":"U","fields":[{"name":"id","type":"long"}]}"""
    val badReader = """{"type":"record","name":"U","fields":[{"name":"id","type":"string"}]}"""
    val wire = ConfluentAvroFrames.serializeAppend(
      Seq(1L).toDF("id"), "t", isKey = false, v1Json).select("wire")
    val e = intercept[org.apache.spark.SparkException] {
      ConfluentAvroFrames.deserializeTagged(
        wire, "wire", "t", isKey = false, badReader, writerSchemaJson = Some(v1Json)).collect()
    }
    def m(t: Throwable): String = Option(t.getCause).map(m).getOrElse("") + t.getMessage
    assert(m(e).contains("incompatible"))
  }

  test("deserializeWithDlq splits good/dead; dead keeps raw wire bytes + reason") {
    val spark = graft.TestSpark.spark
    val (good, dlq) = ConfluentAvroFrames.deserializeWithDlq(
      dlqFixture(spark), "wire", "t", isKey = false, dlqSchemaJson)
    assert(good.columns.toSeq == Seq("rid", "wire", "name", "score"))
    assert(good.select("rid").collect().map(_.getLong(0)).toSeq == Seq(1L))
    val deadRows = dlq.collect()
    assert(deadRows.map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L, 4L, 5L))
    assert(dlq.columns.toSeq == Seq("rid", "wire", "dead_reason"))
    assert(deadRows.forall(_.getAs[Array[Byte]](1) != null))
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
