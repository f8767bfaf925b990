package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def packs: Seq[QueryPack] = Seq(Relational, PipelinePack,
    DedupPack, RetrievalPack, TextPack, CorpusPack, StatsPack,
    ExperimentPack, GraphPack)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A multi-operator slice: dims broadcast, fact-fact join shuffles on the
    * join key, aggregation is partial-then-final, top-k avoids a full sort.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val c = Tables.customer(spark, d)
    val n = Tables.nation(spark, d)
    val o = Tables.orders(spark, d)
    val l = Tables.lineitem(spark, d)
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("lines"))
      .orderBy(col("revenue").desc)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(_.queries).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.map(_.oracles).reduce(_ ++ _)
}
