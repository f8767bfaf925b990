package graft.serde

import graft.core.GraftError
import org.apache.avro.Schema
import org.scalatest.funsuite.AnyFunSuite

/** Compat-level semantics over Avro resolution, pinned on hand-derived
  * vectors — including the transitive counterexample that BACKWARD
  * accepts and BACKWARD_TRANSITIVE rejects. */
class SchemaCompatSpec extends AnyFunSuite {
  import SchemaCompat._

  private def rec(fields: String): Schema = new Schema.Parser().parse(
    s"""{"type":"record","name":"R","namespace":"graft","fields":[$fields]}""")

  private val s1 = rec("""{"name":"a","type":"int"}""")
  // adds b WITH a default — readable both ways
  private val s2 = rec(
    """{"name":"a","type":"int"},{"name":"b","type":"string","default":"x"}""")
  // b loses its default — new reader cannot read s1-era data
  private val s3 = rec(
    """{"name":"a","type":"int"},{"name":"b","type":"string"}""")
  // int -> long promotion of a
  private val s4 = rec("""{"name":"a","type":"long"}""")

  test("pairwise canRead: defaults, missing fields, numeric promotion") {
    assert(canRead(s2, s1), "added-with-default: new reader fills b from the default")
    assert(canRead(s1, s2), "old reader ignores the extra field")
    assert(!canRead(s3, s1), "no default -> s3 cannot read s1 data")
    assert(canRead(s3, s2), "b is present in s2 data")
    assert(canRead(s4, s1), "int promotes to long for the reader")
    assert(!canRead(s1, s4), "long does not demote to int")
    assert(incompatibilities(s3, s1).exists(_.contains("READER_FIELD_MISSING_DEFAULT_VALUE")))
  }

  test("levels: direction, FULL = both, empty history accepts, NONE accepts anything") {
    assert(check(Backward, s2, Seq(s1)).isEmpty)
    assert(check(Forward, s2, Seq(s1)).isEmpty)
    assert(check(Full, s2, Seq(s1)).isEmpty)
    // s4 (long) vs s1 (int): backward ok (long reader), forward broken
    assert(check(Backward, s4, Seq(s1)).isEmpty)
    assert(check(Forward, s4, Seq(s1)).nonEmpty)
    assert(check(Full, s4, Seq(s1)).nonEmpty)
    assert(check(Backward, s3, Seq.empty).isEmpty, "first version always registers")
    assert(check(NoneLevel, s3, Seq(s1)).isEmpty)
  }

  test("the transitive counterexample: BACKWARD accepts s3 after s1,s2; _TRANSITIVE rejects") {
    val hist = Seq(s1, s2)
    assert(check(Backward, s3, hist).isEmpty,
      "vs the LATEST only: s3 reads s2 data fine")
    val v = check(BackwardTransitive, s3, hist)
    assert(v.nonEmpty && v.exists(_.contains("backward vs prior")),
      s"vs ALL priors: s3 cannot read s1 data, got $v")
  }

  test("CompatCheckedRegistry: rejects before minting an id, re-registration is idempotent") {
    val reg = new CompatCheckedRegistry(new InMemorySchemaRegistry, BackwardTransitive)
    val id1 = reg.getOrRegisterId("docs-value", s1)
    val id2 = reg.getOrRegisterId("docs-value", s2)
    assert(id1 != id2)
    val e = intercept[GraftError] { reg.getOrRegisterId("docs-value", s3) }
    assert(e.getMessage.contains("BACKWARD_TRANSITIVE"))
    // the rejected schema never got an id; the accepted ones are stable
    assert(reg.getOrRegisterId("docs-value", s2) == id2)
    // a different subject has its own history
    assert(reg.getOrRegisterId("other-value", s3) > 0)
    // read path still resolves through the underlying registry
    assert(reg.getSchemaById(id1) == s1)
  }
}
