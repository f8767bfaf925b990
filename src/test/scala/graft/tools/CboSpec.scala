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
}
