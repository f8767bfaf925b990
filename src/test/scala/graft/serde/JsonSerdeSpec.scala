package graft.serde

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Schemaless JSON serde parity
  * (ref: tamer `core/src/main/scala/tamer/Codec.scala:174-204` — the JSON
  * codec family: plain bytes, loud decode failures, Option-style nulls).
  */
class JsonSerdeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  test("round-trips hostile strings: quotes, newlines, unicode, backslashes") {
    val rows = Seq(
      (1L, """he said "hi" and left"""),
      (2L, "line one\nline two\ttabbed"),
      (3L, "caf\u00e9 \u4e2d\u6587 \ud83d\ude00"),
      (4L, """c:\path\to\file"""))
    val wire = JsonFrames.serialize(rows.toDF("id", "text"), Seq("id", "text"))
    val back = JsonFrames.deserialize(wire, "wire", schema)
      .select("id", "text").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(back == rows)
  }

  test("wire is a real JSON object: fields addressable by json path") {
    val wire = JsonFrames.serialize(Seq((42L, "t")).toDF("id", "text"), Seq("id", "text"))
    val probed = wire.select(
      get_json_object(col("wire").cast("string"), "$.id").cast("long"),
      get_json_object(col("wire").cast("string"), "$.text")).as[(Long, String)].head()
    assert(probed == ((42L, "t")))
  }

  test("identical rows serialize to identical bytes (wire is dedup-safe)") {
    val df = Seq((1L, "same"), (1L, "same")).toDF("id", "text")
    val wires = JsonFrames.serialize(df, Seq("id", "text"))
      .select(col("wire")).as[Array[Byte]].collect()
    assert(wires(0).sameElements(wires(1)))
  }

  test("null field values are legal (Option-field parity), missing fields decode null") {
    val wire = JsonFrames.serialize(
      Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("id", "text"), Seq("id", "text"))
    val back = JsonFrames.deserialize(wire, "wire", schema)
      .select("id", "text").as[(Long, Option[String])].collect().sortBy(_._1).toSeq
    assert(back == Seq((1L, None), (2L, Some("x"))))
  }

  test("JSON wire feeds the Kafka sink schema directly (record-path parity)") {
    // the reference's JSON codecs serialize K and V of the sink Record;
    // here: key = the id as JSON bytes, value = the whole row as JSON bytes
    val rows = Seq((7L, "payload")).toDF("id", "text")
    val framed = rows
      .withColumn("k", JsonFrames.wireColumn(Seq(col("id"))))
      .withColumn("v", JsonFrames.wireColumn(Seq(col("id"), col("text"))))
    val sinkDf = graft.sinks.KafkaSinkFormat.fromColumns(framed, "k", "v")
    assert(sinkDf.schema.map(f => (f.name, f.dataType.simpleString)) == Seq(
      "key" -> "binary", "value" -> "binary",
      "headers" -> "array<struct<key:string,value:binary>>"))
    val row = sinkDf.head()
    assert(new String(row.getAs[Array[Byte]]("value"), "UTF-8") == """{"id":7,"text":"payload"}""")
    assert(new String(row.getAs[Array[Byte]]("key"), "UTF-8") == """{"id":7}""")
  }

  test("deserializeWithDlq: syntax errors route to the DLQ with their bytes; everything else matches FAILFAST") {
    val rows = Seq(
      (1L, """{"id": 1, "text": "ok"}"""),
      (2L, "{not json at all"), // dead: syntax error
      (3L, """{}"""), // good: valid, fields null
      (4L, null.asInstanceOf[String]), // good: null wire decodes null fields
      (5L, """{"id": 5}""")) // good: missing field null
      .toDF("row_id", "s").select(col("row_id"), col("s").cast("binary").as("wire"))
    val (good, dead) = JsonFrames.deserializeWithDlq(rows, "wire", schema)

    val goodIds = good.select("row_id").as[Long].collect().sorted.toSeq
    assert(goodIds == Seq(1L, 3L, 4L, 5L))
    val deadRows = dead.collect()
    assert(deadRows.map(_.getLong(0)).toSeq == Seq(2L))
    // the quarantined row keeps its raw bytes for replay-after-fix
    assert(new String(deadRows.head.getAs[Array[Byte]]("wire"), "UTF-8") ==
      "{not json at all")

    // the good leg is bit-identical to FAILFAST deserialize on clean input
    val clean = rows.filter(col("row_id") =!= 2L)
    val viaDlq = JsonFrames.deserializeWithDlq(clean, "wire", schema)._1
      .orderBy("row_id").collect().toSeq
    val viaFailfast = JsonFrames.deserialize(clean, "wire", schema)
      .orderBy("row_id").collect().toSeq
    assert(viaDlq == viaFailfast)
  }

  test("deserializeTagged: unconvertible field VALUES route dead, same set FAILFAST throws on") {
    // PERMISSIVE fills the corrupt sentinel on type mismatches too (a string
    // where the schema says long) — the tagged contract pins that those rows
    // route dead, keeping parity with FAILFAST which throws on them.
    val rows = Seq(
      (1L, """{"id": 1, "text": "ok"}"""),
      (2L, """{"id": "not-a-number", "text": "x"}""")) // dead: unconvertible value
      .toDF("row_id", "s").select(col("row_id"), col("s").cast("binary").as("wire"))
    val tagged = JsonFrames.deserializeTagged(rows, "wire", schema)
      .select("row_id", "is_dead").as[(Long, Boolean)].collect().toMap
    assert(!tagged(1L) && tagged(2L))
    // and FAILFAST indeed throws on the same row
    intercept[Exception] { JsonFrames.deserialize(rows, "wire", schema).collect() }
  }

  test("malformed JSON fails the task loudly (FAILFAST), not null-filled") {
    val corrupt = Seq("{\"id\": 1, \"text\": \"ok\"}", "{not json at all")
      .toDF("s").select(col("s").cast("binary").as("wire"))
    val e = intercept[Exception] {
      JsonFrames.deserialize(corrupt, "wire", schema).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m => m.contains("FAILFAST") || m.contains("Malformed")))
  }
}
