package graft.tools

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cost-based-optimizer evidence: table/column statistics (ANALYZE TABLE)
  * change physical join strategy. Without stats a selectively-filtered
  * dimension is sized at its full scan (no broadcast above the
  * threshold); with CBO + column stats the filter's estimated output
  * drops under the threshold and the join plans as broadcast-hash — the
  * "let Catalyst optimize" contract made measurable. At 100 TB this is
  * the difference between a shuffle of the fact table and none, bought
  * by a nightly ANALYZE.
  */
class CboSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ANALYZE column stats flip a filtered-dim join from shuffle to broadcast") {
    val confs = Seq(
      "spark.sql.cbo.enabled" -> spark.conf.get("spark.sql.cbo.enabled"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    spark.sql("DROP TABLE IF EXISTS cbo_fact")
    spark.sql("DROP TABLE IF EXISTS cbo_dim")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      // dim raw size is well above this threshold; its FILTERED output
      // (1 of 97 flags) is well below it
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64 * 1024).toString)
      spark.range(0, 200000).select(col("id").as("fk"), (col("id") % 5000).as("dk"))
        .write.mode("overwrite").saveAsTable("cbo_fact")
      spark.range(0, 5000)
        .select(col("id").as("dk"), (col("id") % 97).as("flag"),
          concat(lit("payload-"), col("id")).as("pad1"),
          md5(col("id").cast("string")).as("pad2"),
          md5((col("id") + 1).cast("string")).as("pad3"))
        .write.mode("overwrite").saveAsTable("cbo_dim")

      def joinPlan(): String = {
        val dim = spark.table("cbo_dim").filter(col("flag") === 7)
        spark.table("cbo_fact").join(dim, "dk")
          .queryExecution.executedPlan.toString
      }

      // basic table stats only: the filter's output estimate stays at the
      // full-scan size -> sort-merge join
      spark.sql("ANALYZE TABLE cbo_fact COMPUTE STATISTICS")
      spark.sql("ANALYZE TABLE cbo_dim COMPUTE STATISTICS")
      val before = joinPlan()
      assert(before.contains("SortMergeJoin") && !before.contains("BroadcastHashJoin"),
        s"expected a shuffle join without column stats:\n$before")

      // column stats let CBO estimate the equality filter's selectivity
      // (~1/97), dropping the dim side under the broadcast threshold
      spark.sql("ANALYZE TABLE cbo_dim COMPUTE STATISTICS FOR COLUMNS flag")
      val after = joinPlan()
      assert(after.contains("BroadcastHashJoin"),
        s"expected CBO to broadcast the filtered dim with column stats:\n$after")
    } finally {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      spark.sql("DROP TABLE IF EXISTS cbo_fact")
      spark.sql("DROP TABLE IF EXISTS cbo_dim")
    }
  }

  test("real pack shape: orders x segment-filtered customer broadcasts WITH stats, SMJ without") {
    // The synthetic flip above, pinned to the ACTUAL query surface: the
    // relational pack's fact x filtered-dim aggregation over the real
    // testdata tables. The broadcast threshold is derived from ANALYZE's
    // own size estimate (half the dim's full size), so the test asserts
    // the ECONOMICS, not a magic constant: a 1-of-5-segments filter
    // estimated at ~1/5 of the dim lands under half, the unfiltered
    // estimate stays above it. Both plans must return identical rows —
    // the flip is free.
    val confs = Seq(
      "spark.sql.cbo.enabled" -> spark.conf.get("spark.sql.cbo.enabled"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    spark.sql("DROP TABLE IF EXISTS cbo_orders")
    spark.sql("DROP TABLE IF EXISTS cbo_customer")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val sf = "/root/testdata/sf0.001"
      graft.Tables.orders(spark, sf).write.mode("overwrite").saveAsTable("cbo_orders")
      graft.Tables.customer(spark, sf).write.mode("overwrite").saveAsTable("cbo_customer")
      spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS")
      spark.sql("ANALYZE TABLE cbo_customer COMPUTE STATISTICS")
      val dimBytes = spark.table("cbo_customer").queryExecution.optimizedPlan
        .stats.sizeInBytes
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (dimBytes / 2).toString)

      def q() = spark.table("cbo_orders")
        .join(spark.table("cbo_customer").filter(col("c_mktsegment") === "BUILDING"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_totalprice").cast("decimal(28,4)")).cast("double").as("revenue"))

      val before = q().queryExecution.executedPlan.toString
      assert(before.contains("SortMergeJoin") && !before.contains("BroadcastHashJoin"),
        s"expected SMJ without column stats:\n$before")
      val rowsBefore = q().collect().toSeq

      spark.sql("ANALYZE TABLE cbo_customer COMPUTE STATISTICS FOR COLUMNS c_mktsegment")
      val after = q().queryExecution.executedPlan.toString
      assert(after.contains("BroadcastHashJoin"),
        s"expected CBO to broadcast the segment-filtered customer side:\n$after")
      assert(q().collect().toSeq == rowsBefore, "the plan flip must not change results")
    } finally {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      spark.sql("DROP TABLE IF EXISTS cbo_orders")
      spark.sql("DROP TABLE IF EXISTS cbo_customer")
    }
  }
}
