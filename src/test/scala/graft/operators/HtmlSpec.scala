package graft.operators

import graft.TestSpark
import graft.functions.HtmlKernel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The HTML extraction leg (q340): pins the region semantics the SQL
  * oracle only sees in aggregate — each trap individually (script-string
  * markup, style rules, boilerplate containers), the entity table edges,
  * comment handling, and the malformed-input taxonomy. */
class HtmlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val D = "<!DOCTYPE html>"

  test("traps: script strings, style rules, and boilerplate never leak into text") {
    val r = HtmlKernel.extract(
      D + """<html><head><title>t</title><style>p { x: 1; }</style>""" +
        """<script>var s = "<p>trap</p>"; if (a < b) {}</script></head>""" +
        """<body><nav><a href="/x">click</a></nav><header><h1>big</h1></header>""" +
        """<p>real words</p><aside>ad</aside><footer>contact</footer></body></html>""")
    assert(r._2 == "real words")
    assert(r._1 == "t")
    assert(r._3 == 1) // the nav link
    // a case-variant raw-text close is honored (</SCRIPT>)
    val up = HtmlKernel.extract(
      D + """<html><body><script>x = "<i>no</i>";</SCRIPT><p>ok</p></body></html>""")
    assert(up._2 == "ok")
    // close-tag PREFIX impostors (r17 advice): '</scriptx>' and
    // '</styles>' are raw text, not terminators — accepting the prefix
    // would end the region early and leak its remainder into the text
    val impostor = HtmlKernel.extract(
      D + """<html><body><script>a = "</scriptx>"; b = "<p>leak</p>";""" +
        """</script><p>clean</p></body></html>""")
    assert(impostor._2 == "clean")
    val styles = HtmlKernel.extract(
      D + """<html><body><style>.x { content: "</styles>"; }""" +
        """</style><p>styled</p></body></html>""")
    assert(styles._2 == "styled")
    // whitespace/solidus after the name IS a whole-name match per spec
    val spaced = HtmlKernel.extract(
      D + """<html><body><script>c = 1;</script ><p>after</p></body></html>""")
    assert(spaced._2 == "after")
  }

  test("entities: the five predefined decode, unknown and numeric stay literal") {
    val r = HtmlKernel.extract(
      D + "<html><body><p>&amp;&lt;&gt;&quot;&apos; and &copy; &#65;</p></body></html>")
    assert(r._2 == "&<>\"' and &copy; &#65;")
    // a decoded &lt; is DATA, not a new tag
    val r2 = HtmlKernel.extract(D + "<html><body><p>&lt;p&gt;x</p></body></html>")
    assert(r2._2 == "<p>x")
  }

  test("comments and whitespace: comment markup is invisible, runs collapse") {
    val r = HtmlKernel.extract(
      D + "<html><body> <!-- <p>ghost</p> --> <p>a\n\n  b</p>  c </body></html>")
    assert(r._2 == "a b c")
    assert(r._4 == 6) // html body p /p /body /html — comment tags never counted
    // unterminated comment swallows the rest (never a leak)
    assert(HtmlKernel.extract(D + "<html><body><p>x</p><!-- y<p>z</p>")._2 == "x")
  }

  test("boilerplate nesting and tallies: depth-counted containers, tag/link counts") {
    val r = HtmlKernel.extract(
      D + "<html><body><footer>f<nav>n</nav>g</footer><p>keep</p>" +
        "<a href=\"/m\">main link text</a></body></html>")
    assert(r._2 == "keep main link text") // anchors OUTSIDE boilerplate contribute text
    assert(r._3 == 1) // boilerplate links were in none here; the main link counts
    // unterminated script swallows the tail; no doctype means null
    assert(HtmlKernel.extract(D + "<html><body><script>var x = 1;")._2 == "")
    assert(HtmlKernel.extract("<html><body><p>x</p></body></html>") == null)
    assert(HtmlKernel.extract(null) == null)
  }

  test("DataFrame chain: syntheticHtmlPages -> htmlExtract returns the exact text") {
    val ids = Seq(
      (3L, "alpha beta gamma delta epsilon zeta", 2),
      (9L, "one two", 5)
    ).toDF("media_id", "text", "n_nav")
    val got = Multimodal.htmlExtract(Multimodal.syntheticHtmlPages(ids), "html")
      .orderBy("media_id").collect()
    // (media_id, is_html, title, n_links, n_tags, text)
    val r3 = got(0)
    assert(r3.getBoolean(1) && r3.getString(2) == "doc 3 & co")
    assert(r3.getInt(3) == 3 && r3.getInt(4) == 34)
    assert(r3.getString(5) == "alpha beta gamma delta epsilon zeta")
    val r9 = got(1)
    assert(r9.getBoolean(1) && r9.getString(2) == "doc 9 & co")
    assert(r9.getInt(3) == 6 && r9.getInt(4) == 40)
    assert(r9.getString(5) == "one two")
  }
}
