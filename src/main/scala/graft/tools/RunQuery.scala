package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev helper: run one named SparkEntry query against an sf dir and print
  * row count + a sample — `sbt "runMain graft.tools.RunQuery q47_http_ingest
  * /root/testdata/sf0.01"`. Not part of the driver contract.
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args.take(2)
    val spark = GraftSession.local("graft-runquery")
    try {
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query '$name'"))
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val rows = df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[runquery] $name rows=$rows elapsed=$secs%.2fs")
      df.show(5, truncate = 60)
    } finally spark.stop()
  }
}
