package graft.tools

import graft._
import graft.operators.Similarity
import org.apache.spark.sql.DataFrame

/** Dev profiler: decompose q48's cost at a given SF (candidates vs full). */
object ProbeLshPairs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("probe-lsh")
    val e = Tables.embeddings(spark, sfDir)
    def time(tag: String)(df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("warm")(e.groupBy().count())
    time("candidates")(Similarity.cosineCandidatePairs(e, "vec_id", "embedding", 64, 3, 32))
    time("full")(Similarity.cosineNearDupPairsLsh(e, "vec_id", "embedding", 0.3, 64, 3, 32))
    spark.stop()
  }
}
