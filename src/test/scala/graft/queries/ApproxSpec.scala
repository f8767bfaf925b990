package graft.queries

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The documented 100 TB fast path for exact distinct counts (q13):
  * approx_count_distinct (HLL++) trades a bounded relative error for a
  * single-pass, fixed-memory aggregate — no expand+re-shuffle like exact
  * multi-column distinct. */
class ApproxSpec extends AnyFunSuite {
  test("approx_count_distinct tracks exact within the configured rsd") {
    val spark = TestSpark.spark
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).head()
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"exact=$exact approx=$approx")
  }
}
