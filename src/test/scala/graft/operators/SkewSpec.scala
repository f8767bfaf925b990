package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedEquiJoin on the pure shuffle path is 1:1 with the plain join") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1") // force the shuffle join the salt exists for
    try {
      val big = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      val dim = Seq(("A", "returned"), ("N", "normal"), ("R", "refunded"))
        .toDF("l_returnflag", "flag_label")
      val salted = Skew.saltedEquiJoin(big, dim, Seq("l_returnflag"), col("l_orderkey"), saltBuckets = 8)
      val plain = big.join(dim, "l_returnflag")

      val plan = salted.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), s"expected a shuffle join:\n$plan")

      def profile(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("l_returnflag", "flag_label")
          .agg(count(lit(1)).as("cnt"), sum($"l_quantity".cast("decimal(28,4)")).as("q"))
          .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDecimal(3))).toSet
      assert(profile(salted) == profile(plain))
      assert(salted.count() == big.count(), "inner join on a covering dim keeps every row")
    } finally spark.conf.set(key, prev)
  }
}
