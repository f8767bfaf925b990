package graft.operators

import graft.TestSpark
import graft.functions.RobotsKernel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The robots.txt leg (q345): pins the RFC 9309 mechanics the SQL oracle
  * sees only in aggregate — wildcard/anchor matching, group selection
  * and merging, tie-breaks, and the permissive failure posture. */
class RobotsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def allowed(robots: String, agent: String, path: String): Boolean =
    RobotsKernel.eval(robots, agent, path)(0) == 1L
  private def delay(robots: String, agent: String, path: String): Long =
    RobotsKernel.eval(robots, agent, path)(1)

  test("pattern matching: wildcards span, $ anchors, longest match wins") {
    assert(RobotsKernel.patternMatches("/a/*.bak$", "/a/x/y.bak"))
    assert(!RobotsKernel.patternMatches("/a/*.bak$", "/a/x.bak.txt"))
    assert(RobotsKernel.patternMatches("/a/*.bak", "/a/x.bak.txt")) // unanchored
    assert(RobotsKernel.patternMatches("/p$", "/p") && !RobotsKernel.patternMatches("/p$", "/pq"))
    assert(RobotsKernel.patternMatches("/*/mid/*", "/x/mid/y"))
    val r = "User-agent: *\nDisallow: /dir/\nAllow: /dir/open/\n"
    assert(!allowed(r, "any", "/dir/x"))
    assert(allowed(r, "any", "/dir/open/x")) // longer allow beats shorter disallow
  }

  test("group selection: named token uses ONLY its group; same-agent groups merge") {
    val r = "User-agent: *\nDisallow: /all/\nCrawl-delay: 9\n\n" +
      "User-agent: BotA\nDisallow: /a/\n\n" +
      "User-agent: bota\nDisallow: /b/\n"
    // BotA (case-insensitive) merges its two groups, ignores the star rules
    assert(!allowed(r, "BOTA", "/a/x") && !allowed(r, "BOTA", "/b/x"))
    assert(allowed(r, "BOTA", "/all/x")) // star's disallow NOT inherited
    assert(delay(r, "BOTA", "/a/x") == -1L) // star's delay not inherited either
    assert(!allowed(r, "otherbot", "/all/x") && delay(r, "otherbot", "/x") == 9L)
    // consecutive user-agent lines share one rule set
    val multi = "User-agent: a\nUser-agent: b\nDisallow: /q/\n"
    assert(!allowed(multi, "b", "/q/x") && allowed(multi, "c", "/q/x"))
  }

  test("failure posture and edges: garbage allows, empty disallow is no-op, comments strip") {
    assert(allowed("<html>500</html>", "any", "/x"))
    assert(delay("<html>500</html>", "any", "/x") == -1L)
    assert(allowed("", "any", "/x"))
    assert(allowed(null, "any", "/x"))
    assert(allowed("User-agent: *\nDisallow:\n", "any", "/x")) // empty = allow all
    val c = "User-agent: * # everyone\nDisallow: /s/ # secret\n"
    assert(!allowed(c, "any", "/s/x") && allowed(c, "any", "/t"))
    // equal-length allow and disallow: allow wins
    val tie = "User-agent: *\nDisallow: /same/\nAllow: /same/\n"
    assert(allowed(tie, "any", "/same/x"))
  }

  test("DataFrame chain: robotsDecision adds per-agent verdict columns") {
    val df = Seq(
      ("User-agent: *\nDisallow: /p/\nCrawl-delay: 4\n", "/p/x"),
      ("User-agent: *\nDisallow: /p/\nCrawl-delay: 4\n", "/q/x")
    ).toDF("robots", "path")
    val got = TextAnalysis.robotsDecision(df, "robots", "path", "anybot", "ab")
      .orderBy("path").collect()
    assert(!got(0).getBoolean(2) && got(0).getLong(3) == 4L)
    assert(got(1).getBoolean(2) && got(1).getLong(3) == 4L)
  }
}
