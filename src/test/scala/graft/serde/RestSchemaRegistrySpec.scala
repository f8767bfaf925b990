package graft.serde

import graft.core.GraftError
import org.apache.avro.Schema
import org.scalatest.funsuite.AnyFunSuite

/** [[RestSchemaRegistry]] against an in-process server speaking the
  * Confluent REST protocol — register, idempotent re-register via subject
  * lookup, fetch-by-id, compat-fail, auth, and the caching decorator
  * actually silencing the wire. (Reference e2e shape: tamer registers and
  * verifies through a real SR container; `Registry.scala:33-181`.)
  */
class RestSchemaRegistrySpec extends AnyFunSuite {

  private val userV1 = new Schema.Parser().parse(
    """{"type":"record","name":"U","fields":[{"name":"id","type":"long"}]}""")
  private val userV2 = new Schema.Parser().parse(
    """{"type":"record","name":"U","fields":[
      |{"name":"id","type":"long"},{"name":"tag","type":"string","default":"d"}]}""".stripMargin)
  // `id` flips long -> string: unresolvable, must fail verification
  private val incompatible = new Schema.Parser().parse(
    """{"type":"record","name":"U","fields":[{"name":"id","type":"string"}]}""")

  private def withServer(auth: Option[String] = None)(body: SrFixtureServer => Unit): Unit = {
    val server = new SrFixtureServer(auth).start()
    try body(server) finally server.stop()
  }

  test("register assigns monotonic ids; re-register resolves the same id via lookup") {
    withServer() { server =>
      val reg = new RestSchemaRegistry(server.url)
      val id1 = reg.getOrRegisterId("users-value", userV1)
      val id2 = reg.getOrRegisterId("users-value", userV2)
      assert(id1 == 1 && id2 == 2)
      val registersBefore = server.registerCalls.get()
      assert(reg.getOrRegisterId("users-value", userV1) == id1)
      // the second resolve of a known schema is a subject lookup, not a new version
      assert(server.registerCalls.get() == registersBefore)
    }
  }

  test("getSchemaById round-trips the registered schema; 404 is SchemaNotFound, 5xx stays fatal") {
    withServer() { server =>
      val reg = new RestSchemaRegistry(server.url)
      val id = reg.getOrRegisterId("users-value", userV1)
      assert(reg.getSchemaById(id) == userV1)
      // authoritative not-found: the routable (DLQ-able) error type
      val nf = intercept[SchemaNotFound](reg.getSchemaById(99))
      assert(nf.getMessage.contains("99"))
      // registry outage: NOT routable — must surface as a fatal GraftError
      server.failFetches.set(true)
      val e = intercept[GraftError](reg.getSchemaById(id + 1000))
      assert(e.getMessage.contains("500"))
      server.failFetches.set(false)
    }
  }

  test("caching decorator memoizes not-found but never a transient failure") {
    withServer() { server =>
      val reg = new CachingSchemaRegistry(new RestSchemaRegistry(server.url))
      intercept[SchemaNotFound](reg.getSchemaById(77))
      val f0 = server.fetchCalls.get()
      intercept[SchemaNotFound](reg.getSchemaById(77))
      assert(server.fetchCalls.get() == f0, "repeat not-found must not re-hit the wire")
      server.failFetches.set(true)
      intercept[GraftError](reg.getSchemaById(78))
      server.failFetches.set(false)
      // the outage was not cached: the retry reaches the recovered registry
      intercept[SchemaNotFound](reg.getSchemaById(78))
    }
  }

  test("verifySchema passes compatible evolution and aborts on incompatible reader") {
    withServer() { server =>
      val reg = new RestSchemaRegistry(server.url)
      val id = reg.getOrRegisterId("users-value", userV1)
      reg.verifySchema(id, userV2) // added-with-default: compatible
      val e = intercept[GraftError](reg.verifySchema(id, incompatible))
      assert(e.getMessage.contains("incompatible"))
    }
  }

  test("basic and bearer auth headers are sent; missing auth is a loud 401") {
    withServer(Some(graft.sources.GraftHttp.basicHeader("svc", "s3cret"))) { server =>
      val anon = new RestSchemaRegistry(server.url)
      val e = intercept[GraftError](anon.getOrRegisterId("users-value", userV1))
      assert(e.getMessage.contains("401"))
      val basic = new RestSchemaRegistry(server.url, RegistryAuth.Basic("svc", "s3cret"))
      assert(basic.getOrRegisterId("users-value", userV1) == 1)
    }
    withServer(Some("Bearer tok123")) { server =>
      val bearer = new RestSchemaRegistry(server.url, RegistryAuth.Bearer("tok123"))
      assert(bearer.getOrRegisterId("users-value", userV1) == 1)
    }
  }

  test("caching decorator silences the wire for repeated operations") {
    withServer() { server =>
      val reg = new CachingSchemaRegistry(new RestSchemaRegistry(server.url))
      val id = reg.getOrRegisterId("users-value", userV1)
      reg.verifySchema(id, userV2)
      val (l0, r0, f0) = (server.lookupCalls.get(), server.registerCalls.get(), server.fetchCalls.get())
      (1 to 5).foreach { _ =>
        assert(reg.getOrRegisterId("users-value", userV1) == id)
        assert(reg.getSchemaById(id) == userV1)
        reg.verifySchema(id, userV2)
      }
      assert((server.lookupCalls.get(), server.registerCalls.get(), server.fetchCalls.get()) == ((l0, r0, f0)))
    }
  }

  test("DataFrame avro serde round-trips with ids resolved by the REST registry") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    withServer() { server =>
      val url = server.url
      val schemaJson =
        """{"type":"record","name":"U","fields":[
          |{"name":"id","type":"long"},{"name":"name","type":"string"}]}""".stripMargin
      // local[32]: executor threads share the JVM, so the in-process stub is
      // reachable from every partition — the factory still crosses the
      // driver->executor boundary as a real deployment's would.
      val factory: ConfluentAvroFrames.RegistryFactory =
        () => new CachingSchemaRegistry(new RestSchemaRegistry(url))
      val df = Seq((1L, "ann"), (2L, "bob"), (3L, "cyd")).toDF("id", "name")
      val wire = ConfluentAvroFrames.serialize(df, "users", isKey = false, schemaJson, factory)
      val back = ConfluentAvroFrames.deserialize(wire, "wire", "users", isKey = false,
          schemaJson, registryFactory = Some(factory))
        .select("id", "name").as[(Long, String)].collect().sorted.toSeq
      assert(back == Seq((1L, "ann"), (2L, "bob"), (3L, "cyd")))
      assert(server.registerCalls.get() >= 1) // ids really came from the service
    }
  }
}
