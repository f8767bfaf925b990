package graft.functions

import graft.TestSpark
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("codegen'd dot is bit-identical to the higher-order form on random vectors") {
    val genVec = Gen.listOfN(16, Gen.chooseNum(-1e3, 1e3))
    val prop = Prop.forAll(genVec, genVec) { (a, b) =>
      val df = Seq((a.toArray, b.toArray)).toDF("a", "b")
      val row = df.select(
        VectorExpressions.dot(col("a"), col("b")).as("fast"),
        Similarity.dot(col("a"), col("b")).as("hof")).head()
      java.lang.Double.doubleToRawLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(row.getDouble(1))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("null semantics match the HOF form: length mismatch and null elements yield null") {
    val df = Seq(
      (Array(1.0, 2.0), Array(1.0, 2.0, 3.0)),         // length mismatch
      (Array(1.0, 2.0), Array(1.0, 2.0))               // clean
    ).toDF("a", "b")
    val out = df.select(VectorExpressions.dot(col("a"), col("b"))).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getDouble(0) == 5.0)

    val withNullElem = spark.sql("SELECT array(1.0d, NULL, 3.0d) AS a, array(1.0d, 2.0d, 3.0d) AS b")
    VectorExpressions.register(spark)
    assert(withNullElem.selectExpr("graft_dot(a, b)").head().isNullAt(0))
  }

  test("registered SQL function computes the dot product") {
    VectorExpressions.register(spark)
    val v = spark.sql("SELECT graft_dot(array(1.0d,2.0d,3.0d), array(4.0d,5.0d,6.0d))").head().getDouble(0)
    assert(v == 32.0)
  }
}
