package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Op
import graft.sources.Tables

/** HTML / markup main-content extraction (north-star extension; the
  * reference has no HTML ops — every web-scale corpus starts as HTML, and
  * this is the curation step that runs BEFORE any text op in
  * [[TextOps]]).
  *
  * The extractor is the standard tag-soup-free pipeline: drop
  * `<script>`/`<style>` subtrees, split the page into blocks at
  * block-level closing tags, keep blocks that are text-DENSE (an integer
  * percent rule — no float thresholds, so results are engine- and
  * partitioning-invariant), strip the remaining tags, decode the common
  * entities. Pages where no block clears the rule (malformed markup, tag
  * soup with no block closers) fall back to a whole-page strip, flagged.
  *
  * Scale shape: ONE narrow codegen map over the page scan — no shuffle, no
  * UDF, embarrassingly parallel at 100 TB. The fixture has no real HTML, so
  * the registered op wraps each document in a deterministic page template
  * (the [[graft.multimodal.Multimodal]] synthesized-payload precedent); the
  * template carries exactly the boilerplate a real page does (title, nav,
  * script, style, footer) and the EXTRACTOR is the artifact under test —
  * the oracle replays it with the same regexes, and HtmlSpec pins the
  * boilerplate-drop / body-keep / malformed-fallback cases on constructed
  * pages.
  */
object Html {

  /** Minimum tag-stripped block length (chars) to qualify as content. */
  val minBlockChars = 40

  /** Text-density floor: keep a block when
    * `stripped_len * 100 >= densityPct * raw_len` (integer cross-multiply).
    */
  val densityPct = 60

  private val scriptStylePat = "<(script|style)[^>]*>.*?</(script|style)>"
  private val blockClosePat = "</(p|h1|h2|h3|li|nav|footer|title|td)>"
  private val tagPat = "<[^>]*>"

  // ------------------------------------------------------------------------
  // Deterministic fixture page template
  // ------------------------------------------------------------------------

  private val pgTitle = "<html><head><title>Doc "
  private val pgHead = "</title><style>body { font: 14px }</style>" +
    "<script>var t = 1 && 2;</script></head><body>" +
    "<nav><a href=\"/\">Home</a> | <a href=\"/about\">About</a> | " +
    "<a href=\"/contact\">Contact</a></nav><div class=\"content\"><h1>Entry "
  private val pgBody = "</h1><p>"
  private val pgTail = "</p><p>Rated 5 &amp; up &quot;verified&quot; " +
    "&lt;editors&gt;</p></div><footer>Copyright 2026 Example Corp</footer>" +
    "</body></html>"

  /** Escape &, <, > so arbitrary document text embeds losslessly (and the
    * extractor's entity decode round-trips it back).
    */
  private def escCol(c: Column): Column =
    replace(replace(replace(c, lit("&"), lit("&amp;")),
      lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))

  private def escSql(x: String): String =
    s"replace(replace(replace($x, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Deterministically HTML-wrapped fixture pages: (doc_id, html). */
  def wrapDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      concat(lit(pgTitle), col("doc_id").cast(StringType), lit(pgHead),
        col("doc_id").cast(StringType), lit(pgBody), escCol(col("text")),
        lit(pgTail)).as("html"))

  // ------------------------------------------------------------------------
  // Extractor
  // ------------------------------------------------------------------------

  /** Tag-strip + whitespace-collapse + trim of one block. Entities stay
    * encoded here — length tests and the density rule run on the encoded
    * form (identical on both engines); decode happens once on the result.
    */
  private def blockText(b: Column): Column =
    trim(regexp_replace(regexp_replace(b, tagPat, " "), " {2,}", " "))

  private def blockTextSql(x: String): String =
    s"trim(regexp_replace(regexp_replace($x, '$tagPat', ' ', 'g'), ' {2,}', ' ', 'g'))"

  /** Decode the common ASCII entities; `&amp;` LAST (the standard order —
    * decoding it first would double-decode `&amp;lt;`).
    */
  private def decodeEntities(c: Column): Column =
    replace(replace(replace(replace(replace(replace(c,
      lit("&nbsp;"), lit(" ")),
      lit("&lt;"), lit("<")),
      lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")),
      lit("&#39;"), lit("'")),
      lit("&amp;"), lit("&"))

  private def decodeEntitiesSql(x: String): String =
    s"""replace(replace(replace(replace(replace(replace($x,
       |  '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
       |  '&quot;', '"'), '&#39;', ''''), '&amp;', '&')""".stripMargin

  /** Main-content extraction over any (doc_id, html) frame: per page the
    * count of content blocks kept, the fallback flag, and the extracted
    * text (kept blocks joined by one space; whole-page strip when nothing
    * qualifies).
    */
  def extractMainContent(pages: DataFrame): DataFrame = {
    val noScript = regexp_replace(col("html"), scriptStylePat, " ")
    pages
      .withColumn("h", noScript)
      .withColumn("kept", filter(split(col("h"), blockClosePat), b =>
        length(blockText(b)) >= minBlockChars &&
          length(blockText(b)) * 100 >= lit(densityPct) * length(b)))
      .select(col("doc_id"),
        size(col("kept")).cast(LongType).as("n_blocks_kept"),
        when(size(col("kept")) === 0, 1).otherwise(0)
          .cast(IntegerType).as("used_fallback"),
        decodeEntities(
          when(size(col("kept")) === 0, blockText(col("h")))
            .otherwise(concat_ws(" ", transform(col("kept"), b => blockText(b)))))
          .as("main_text"))
  }

  /** The registered fixture op: wrap, then extract. */
  def extractHtml(docs: DataFrame): DataFrame =
    extractMainContent(wrapDocuments(docs))

  // ------------------------------------------------------------------------
  // Registered ops
  // ------------------------------------------------------------------------

  /** Oracle twin: the same template concatenation and the same three
    * regexes (all RE2-and-Java-compatible: literal alternations, `[^>]*`,
    * one non-greedy span over a single-line page).
    */
  private lazy val extractHtmlOracle: String = {
    val bt = blockTextSql("b")
    val btWhole = blockTextSql("h")
    s"""WITH pg AS (
       |  SELECT doc_id,
       |         ${sqlLit(pgTitle)} || CAST(doc_id AS VARCHAR) || ${sqlLit(pgHead)}
       |           || CAST(doc_id AS VARCHAR) || ${sqlLit(pgBody)}
       |           || ${escSql("text")} || ${sqlLit(pgTail)} AS html
       |  FROM documents),
       |ns AS (SELECT doc_id,
       |              regexp_replace(html, '$scriptStylePat', ' ', 'g') AS h
       |       FROM pg),
       |kp AS (SELECT doc_id, h,
       |              list_filter(string_split_regex(h, '$blockClosePat'),
       |                b -> length($bt) >= $minBlockChars
       |                     AND length($bt) * 100 >= $densityPct * length(b)) AS kept
       |       FROM ns)
       |SELECT doc_id,
       |       CAST(len(kept) AS BIGINT) AS n_blocks_kept,
       |       CAST(CASE WHEN len(kept) = 0 THEN 1 ELSE 0 END AS INTEGER) AS used_fallback,
       |       ${decodeEntitiesSql(
                  s"CASE WHEN len(kept) = 0 THEN $btWhole " +
                  s"ELSE array_to_string(list_transform(kept, b -> $bt), ' ') END")} AS main_text
       |FROM kp""".stripMargin
  }

  def ops: Seq[Op] = Seq(
    Op.sql("text_extract_html", extractHtmlOracle) { (s, d) =>
      extractHtml(Tables.documents(s, d))
    },
  )
}
