package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (tests run forked in a single
  * JVM; building a session per suite costs ~5 s each). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession
      .builder("graft-test", Some("local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      // saveAsTable (bucketed-layout specs) must not litter the repo cwd
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
