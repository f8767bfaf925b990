package graft

/** Plan-audit utility: print the formatted physical plan of one or more
  * queries (`runMain graft.Explain q02_filter_pushdown [sfDir]`). Used to
  * check the plans we ship are the plans we want: pushed filters, pruned
  * schemas, broadcast vs shuffle joins, whole-stage codegen spans.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted else args.filter(SparkEntry.queries.contains).toSeq
    val sfDir = args.find(_.startsWith("/")).getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local("graft-explain")
    names.foreach { name =>
      println(s"\n===== $name =====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
