package graft.tools

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime skew handling evidence: AQE's OptimizeSkewedJoin splits an
  * oversized shuffle partition of a sort-merge join into parallel splits
  * AT RUNTIME, off the real map-output sizes — the engine-level backstop
  * behind the manual salting operators ([[graft.operators.Skew]]). The
  * test builds a join whose key distribution is 90% one key, lowers the
  * skew thresholds so the ~MB-scale test shuffle qualifies, runs the
  * join, and asserts the FINAL adaptive plan's SMJ is marked as a skew
  * join — plus that results equal the non-adaptive plan (the split is
  * free). At 100 TB this is why a hot join key degrades to extra
  * parallel tasks instead of one straggler executor.
  */
class AqeSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AQE marks and splits the skewed SMJ partition at runtime; rows unchanged") {
    val keep = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // the test shuffle is ~MB-scale; production defaults (256 MB) would
      // never see it as skewed — scale the thresholds, not the data
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "200k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "100k")
      // the aggregation ABOVE the join could reuse the join's hash
      // partitioning, so by default AQE vetoes the skew split (it would
      // add a shuffle); force accepts that trade — at scale, one extra
      // shuffle of the aggregation input beats a straggler executor
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ

      // 90% of fact rows share key 0 and carry a fat payload
      val fact = spark.range(0, 120000).select(
        when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id") % 1000).as("k"),
        concat(lit("payload-"), col("id"),
          lit("-" + "x" * 64)).as("payload"))
      val dim = spark.range(0, 1000).select(col("id").as("k"),
        concat(lit("dim-"), col("id")).as("dname"))

      def joined = fact.join(dim, "k")
      // aggregate OVER the payload so column pruning can't strip it from
      // the shuffle — the skewed bytes must actually move
      val agg = joined.groupBy(col("k"))
        .agg(count(lit(1)).as("n"), max(col("payload")).as("pmax"))
      val withAqe = agg.collect().sortBy(_.getLong(0)).toSeq

      // post-execution, the adaptive plan is final — the skew split shows
      // up as isSkewJoin on the SMJ node
      // explicit recursion: AQE wraps completed subtrees in QueryStageExec
      // nodes, which are LEAVES to TreeNode traversal — the SMJ lives
      // inside a (result) stage's `plan`
      val smjs = scala.collection.mutable.ArrayBuffer.empty[Boolean]
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
          smjs += s.isSkewJoin; s.children.foreach(walk)
        case other => other.children.foreach(walk)
      }
      walk(agg.queryExecution.executedPlan)
      assert(smjs.nonEmpty && smjs.contains(true),
        s"expected a skew-split SMJ in the final adaptive plan; saw flags $smjs in\n" +
          agg.queryExecution.executedPlan.toString.take(4000))

      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val without = agg.collect().sortBy(_.getLong(0)).toSeq
      assert(withAqe == without, "the skew split must not change results")
    } finally keep.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
}
