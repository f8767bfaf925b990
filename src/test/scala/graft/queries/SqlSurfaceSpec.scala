package graft.queries

import graft.{Tables, TestSpark}
import graft.functions.VectorExpressions
import org.scalatest.funsuite.AnyFunSuite

/** The SQL entry point is part of the API surface: registered views +
  * spark.sql + the engine's registered functions compose with the operator
  * library.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("spark.sql over registered testdata views agrees with the DataFrame API") {
    val d = "/root/testdata/sf0.001"
    Tables.lineitem(spark, d).createOrReplaceTempView("sql_lineitem")
    val sql = spark.sql(
      "SELECT l_returnflag, count(*) AS cnt FROM sql_lineitem GROUP BY l_returnflag ORDER BY l_returnflag")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val df = Tables.lineitem(spark, d)
      .groupBy("l_returnflag").count().orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sql == df && sql.nonEmpty)
  }

  test("registered engine functions are usable from SQL over real tables") {
    val d = "/root/testdata/sf0.001"
    VectorExpressions.register(spark)
    Tables.embeddings(spark, d).createOrReplaceTempView("sql_embeddings")
    val selfSim = spark.sql("""
      SELECT vec_id,
             graft_dot(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>)) AS sq_norm
      FROM sql_embeddings ORDER BY vec_id LIMIT 5""").collect()
    assert(selfSim.length == 5)
    assert(selfSim.forall(_.getDouble(1) > 0.0))
  }
}
