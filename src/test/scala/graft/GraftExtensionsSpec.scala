package graft

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The extensions hook must make `graft_dot` a real SQL function in every
  * session [[GraftSession]] builds — TestSpark goes through that factory,
  * so plain `spark.sql` here IS the end-to-end deployment path
  * (`--conf spark.sql.extensions=graft.GraftExtensions`). */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("graft_dot is callable from pure SQL via the session extension") {
    val v = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(v == 11.0)
    // null semantics ride through SQL: length mismatch -> null
    assert(spark.sql("SELECT graft_dot(array(1.0d), array(1.0d, 2.0d))").head().isNullAt(0))
    // DESCRIBE works (the ExpressionInfo is wired)
    val desc = spark.sql("DESCRIBE FUNCTION graft_dot").collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("graft_dot"))
  }

  test("wrong arity fails analysis loudly") {
    val e = intercept[Exception](spark.sql("SELECT graft_dot(array(1.0d))").collect())
    assert(e.getMessage.contains("graft_dot"))
  }
}
