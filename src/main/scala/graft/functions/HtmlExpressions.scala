package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML main-content extraction kernel — the step between the WARC walk
  * (q338 hands a crawl pipeline `response` records whose blocks are HTML)
  * and every text operator downstream: strip markup, DROP the regions
  * that are not content (script/style/comments wholesale; the
  * nav/header/footer/aside BOILERPLATE containers — the trafilatura/
  * jusText move, reduced to its deterministic core), decode the five
  * predefined character entities, normalize whitespace, and keep the
  * title and the link/tag tallies a quality gate wants (link density is
  * a classic boilerplate signal).
  *
  * Deterministic single-pass state machine, NOT a browser parser: no
  * tree, no error recovery, no CSS — the subset is exactly what the
  * cross-engine gate can pin (q340 plants structured pages and the
  * oracle regenerates title/text/counts closed-form; the planted traps —
  * a `"<p>…</p>"` INSIDE a script string, rule text inside `<style>`,
  * heading text inside boilerplate containers — fail any extractor that
  * tag-strips without region awareness). Tags act as whitespace;
  * consecutive whitespace collapses to one space; text is trimmed.
  */
object HtmlKernel {

  private val Doctype = "<!DOCTYPE html>"
  private val Boilers = Set("nav", "header", "footer", "aside")

  private def indexOfIgnoreCase(s: String, target: String, from: Int): Int = {
    val n = s.length; val m = target.length
    var i = math.max(from, 0)
    while (i + m <= n) {
      if (s.regionMatches(true, i, target, 0, m)) return i
      i += 1
    }
    -1
  }

  /** (title, text, nLinks, nTags), or null when the input does not open
    * with the HTML5 doctype (the is-this-even-HTML screen; real crawl
    * filtering would sniff more liberally, but the gate wants a sharp
    * predicate). nTags counts every lexed element tag — including
    * boilerplate markup and the script/style open+close pair, EXCLUDING
    * their contents (a `<p>` inside a JS string is not markup), comments,
    * and the doctype. nLinks counts `<a` opens anywhere in markup. */
  def extract(html: String): (String, String, Int, Int) = {
    if (html == null || !html.startsWith(Doctype)) return null
    val n = html.length
    var i = Doctype.length
    val text = new java.lang.StringBuilder
    val title = new java.lang.StringBuilder
    var nLinks = 0; var nTags = 0
    var pendingSpace = false
    var inTitle = false
    var boilerDepth = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          val e = html.indexOf('>', i)
          if (e < 0) i = n // malformed tail: nothing lexable remains
          else {
            val inner = html.substring(i + 1, e)
            val closing = inner.startsWith("/")
            val raw = if (closing) inner.substring(1) else inner
            var k = 0
            while (k < raw.length && Character.isLetterOrDigit(raw.charAt(k))) k += 1
            val name = raw.substring(0, k).toLowerCase
            nTags += 1
            pendingSpace = true
            if (!closing && name == "a") nLinks += 1
            if (!closing && (name == "script" || name == "style")) {
              // raw-text elements: contents are NOT markup — skip to the
              // real close tag, never lexing inside. A close-tag match
              // must be a WHOLE-name match (HTML spec: tag name followed
              // by '>', whitespace, or '/'): '</scriptx>' inside the raw
              // text is NOT a terminator, and accepting the prefix would
              // leak the region's remainder into extracted text (r17
              // advice — the q340-trap class)
              val probe = "</" + name
              var e2 = indexOfIgnoreCase(html, probe, e + 1)
              while (e2 >= 0 && e2 + probe.length < n && {
                val c = html.charAt(e2 + probe.length)
                !(c == '>' || c == '/' || Character.isWhitespace(c))
              }) e2 = indexOfIgnoreCase(html, probe, e2 + 1)
              if (e2 < 0) i = n
              else {
                val e3 = html.indexOf('>', e2)
                nTags += 1
                i = if (e3 < 0) n else e3 + 1
              }
            } else {
              if (name == "title") inTitle = !closing
              if (Boilers.contains(name)) {
                if (closing) boilerDepth = math.max(0, boilerDepth - 1)
                else boilerDepth += 1
              }
              i = e + 1
            }
          }
        }
      } else {
        var ch = c
        var adv = 1
        if (c == '&') {
          // bounded lookahead: the longest supported entity is 6 chars
          // ("&quot;"), so scan at most that window — an unterminated
          // '&' run can never turn the pass quadratic
          val lim = math.min(i + 7, n)
          var sc = -1
          var j = i + 1
          while (j < lim && sc < 0) { if (html.charAt(j) == ';') sc = j; j += 1 }
          if (sc > i && sc - i <= 6) {
            html.substring(i + 1, sc) match {
              case "amp" => ch = '&'; adv = sc - i + 1
              case "lt" => ch = '<'; adv = sc - i + 1
              case "gt" => ch = '>'; adv = sc - i + 1
              case "quot" => ch = '"'; adv = sc - i + 1
              case "apos" => ch = '\''; adv = sc - i + 1
              case _ => // unknown entity: literal '&'
            }
          }
        }
        if (boilerDepth == 0) {
          val sink = if (inTitle) title else text
          if (Character.isWhitespace(ch)) pendingSpace = true
          else {
            if (pendingSpace && sink.length > 0) sink.append(' ')
            pendingSpace = false
            sink.append(ch)
          }
        }
        i += adv
      }
    }
    (title.toString, text.toString, nLinks, nTags)
  }

  /** Boxed-row helper shared by the interpreted and generated paths. */
  def extractRow(html: UTF8String): InternalRow = {
    val r = extract(html.toString)
    if (r == null) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(r._1), UTF8String.fromString(r._2),
        r._3, r._4))
  }
}

/** Fused html → struct(title, text, n_links, n_tags); null when the
  * input is not HTML (no doctype) — the boilerplate-stripping scan that
  * turns a crawl's response blocks into pipeline text, one state-machine
  * pass per row inside WholeStageCodegen, zero shuffle. */
case class HtmlExtractExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_html_extract requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = HtmlExtractExpr.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_html_extract"

  override def nullSafeEval(h: Any): Any =
    HtmlKernel.extractRow(h.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h =>
      s"""${ev.value} = graft.functions.HtmlKernel.extractRow($h);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HtmlExtractExpr {
  val schema: StructType = StructType(Seq(
    StructField("title", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("n_links", IntegerType, nullable = false),
    StructField("n_tags", IntegerType, nullable = false)))
}

object HtmlExpressions {
  /** struct(title, text, n_links, n_tags) of an HTML string column;
    * null when the value does not open with the HTML5 doctype. */
  def htmlExtract(html: Column): Column =
    GraftShims.column(HtmlExtractExpr(GraftShims.expression(html)))
}
