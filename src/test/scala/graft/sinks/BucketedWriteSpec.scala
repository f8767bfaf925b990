package graft.sinks

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketedWriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("co-bucketed fact-fact join plans with ZERO exchanges and matches the plain join") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1") // force the shuffle the bucketing must remove
    try {
      val orders = (1L to 2000L).map(i => (i % 97, i, s"o$i")).toDF("cust", "order_id", "o_tag")
      val events = (1L to 5000L).map(i => (i % 97, i, s"e$i")).toDF("cust", "event_id", "e_tag")
      BucketedWrite.writeBucketed(orders, "bw_orders", numBuckets = 4, bucketCols = Seq("cust"))
      BucketedWrite.writeBucketed(events, "bw_events", numBuckets = 4, bucketCols = Seq("cust"))

      val joined = spark.table("bw_events").join(spark.table("bw_orders"), "cust")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle either side:\n$plan")

      // same rows as the un-bucketed join
      val expected = events.join(orders, "cust").count()
      assert(joined.count() == expected)

      // an aggregation on the bucket key also rides the layout: no exchange
      val agg = spark.table("bw_events").groupBy("cust").agg(count(lit(1)))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
        "groupBy on the bucket key must reuse the bucket partitioning")

      // mismatched bucket counts degrade to a correct (shuffled) join, not
      // a wrong answer
      BucketedWrite.writeBucketed(orders, "bw_orders8", numBuckets = 8, bucketCols = Seq("cust"))
      val mixed = spark.table("bw_events").join(spark.table("bw_orders8"), "cust")
      assert(mixed.count() == expected)
    } finally {
      spark.conf.set(key, prev)
      Seq("bw_orders", "bw_events", "bw_orders8").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
