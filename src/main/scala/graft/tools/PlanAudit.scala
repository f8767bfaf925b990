package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.DataFrame

/** Physical-plan scale-killer audit, shared between the dev `main` below and
  * the regression gate `PlanAuditSpec` (which fails the build when a query
  * plans a CARTESIAN / BNLJ / BCAST-DERIVED not on its explicit allowlist).
  *
  * Flags:
  *  - CARTESIAN / BNLJ — O(n^2) join strategies (only q31 is allowed one,
  *    as the documented exact baseline);
  *  - EXCH=n — number of shuffle exchanges (eyeball against the operator's
  *    expected shape; a jump means a lost partitioning);
  *  - SORT=n — full sorts (top-k should plan TakeOrdered instead; the
  *    trailing output orderBy each oracle query carries accounts for 1);
  *  - BCAST-DERIVED=n — a BroadcastExchange whose subtree contains a
  *    Generate/aggregate/shuffle, i.e. a broadcast of a COMPUTED relation
  *    chosen off Catalyst's static estimate, which for explode->aggregate
  *    chains is the pre-explode scan size and therefore garbage. A scanned
  *    dimension table broadcasting is fine (file-size estimates are
  *    accurate and dims stay dims at any SF); a derived broadcast is how
  *    the LSH verify join OOM'd at 16x the gate SF — each flag here needs
  *    an explicit justification (scalar counts, trained quantizers, and
  *    deliberately replicated salt tables qualify; candidate tables never).
  *
  * WholeStageCodegen is NOT flagged: under AQE codegen is applied per query
  * stage at runtime, so the pre-execution plan never shows the spans.
  *
  * Not part of the driver contract.
  */
object PlanAudit {

  /** Counters from one physical-plan walk. */
  final case class Audit(cartesian: Int, bnlj: Int, bcastDerived: Int, exch: Int, sort: Int,
      scalaUdf: Int = 0) {
    def render: String = Seq(
      if (cartesian > 0) s"CARTESIAN=$cartesian" else "",
      if (bnlj > 0) s"BNLJ=$bnlj" else "",
      if (bcastDerived > 0) s"BCAST-DERIVED=$bcastDerived" else "",
      if (scalaUdf > 0) s"SCALA-UDF=$scalaUdf" else "",
      s"EXCH=$exch", s"SORT=$sort"
    ).filter(_.nonEmpty).mkString(" ")
  }

  /** Walk a frame's pre-execution physical plan (AQE initial plan) and count
    * the scale-killer shapes. Pure inspection — does not execute the query
    * beyond what building `executedPlan` requires. */
  def audit(df: DataFrame): Audit = {
    var cartesian, bnlj, exch, sort, bcastDerived, scalaUdf = 0
    def derived(p: org.apache.spark.sql.execution.SparkPlan): Boolean = {
      var hit = false
      p.foreach {
        case _: org.apache.spark.sql.execution.GenerateExec => hit = true
        case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => hit = true
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => hit = true
        case _ => ()
      }
      hit
    }
    // AdaptiveSparkPlanExec is a leaf to TreeNode.foreach — unwrap it
    // (pre-execution: audit the initial plan AQE starts from)
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = p.foreach {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.initialPlan)
      case _: org.apache.spark.sql.execution.joins.CartesianProductExec => cartesian += 1
      case _: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => bnlj += 1
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeLike =>
        if (derived(b.child)) bcastDerived += 1
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => exch += 1
      case _: org.apache.spark.sql.execution.SortExec => sort += 1
      case _ => ()
    }
    // ScalaUDFs break the surrounding WholeStageCodegen span and pay a
    // per-row catalyst<->Scala conversion — the repo is UDF-free by
    // policy (native Expressions instead); this counter keeps it so
    def countUdfs(p: org.apache.spark.sql.execution.SparkPlan): Unit = p.foreach {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        countUdfs(a.initialPlan)
      case node => node.expressions.foreach(_.foreach {
        case _: org.apache.spark.sql.catalyst.expressions.ScalaUDF => scalaUdf += 1
        // TreeNode.foreach does not descend into subquery PLANS — a UDF
        // hidden inside a scalar/IN subquery must still count
        case sub: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] =>
          sub.plan match {
            case sp: org.apache.spark.sql.execution.SparkPlan => countUdfs(sp)
            case _ => ()
          }
        case _ => ()
      })
    }
    walk(df.queryExecution.executedPlan)
    countUdfs(df.queryExecution.executedPlan)
    Audit(cartesian, bnlj, bcastDerived, exch, sort, scalaUdf)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    val spark = GraftSession.local("graft-planaudit")
    try {
      val names = SparkEntry.queries.keys.toSeq.sorted
        .filter(n => only.isEmpty || only(n))
      names.foreach { name =>
        try {
          val df = SparkEntry.queries(name)(spark, sfDir)
          println(s"[audit] $name ${audit(df).render}")
        } catch {
          case e: Exception => println(s"[audit] $name ERROR ${e.getMessage.take(120)}")
        }
      }
    } finally spark.stop()
  }
}
