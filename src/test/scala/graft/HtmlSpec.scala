package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Html

/** Mechanism tests for HTML main-content extraction on constructed pages
  * with known boilerplate/content structure.
  */
class HtmlSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val body = ("lorem ipsum dolor sit amet " * 4).trim // 107 chars

  test("wrapped fixture page: body kept, nav/title/script/style/footer dropped") {
    val docs = Seq((7L, body, "en", "s0", body.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Html.extractHtml(docs).collect().head
    assert(r.getAs[Int]("used_fallback") == 0)
    // the body paragraph and the dense constant paragraph both clear the rule
    assert(r.getAs[Long]("n_blocks_kept") == 2L)
    val main = r.getAs[String]("main_text")
    assert(main.contains(body), s"body text must round-trip: $main")
    // entities in the kept constant paragraph are decoded
    assert(main.contains("Rated 5 & up \"verified\" <editors>"))
    // boilerplate never leaks into the extraction
    assert(!main.contains("Home"))
    assert(!main.contains("Copyright"))
    assert(!main.contains("font: 14px"))
    assert(!main.contains("var t"))
    assert(!main.contains("Doc 7") && !main.contains("Entry 7"))
  }

  test("escaped characters in the document text survive the round-trip") {
    val tricky = "tags like <b> and amps like A&B survive " + body
    val docs = Seq((1L, tricky, "en", "s0", tricky.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val main = Html.extractHtml(docs).collect().head.getAs[String]("main_text")
    assert(main.contains("tags like <b> and amps like A&B survive"))
  }

  test("link farms are dropped by density; dense paragraphs kept") {
    val farm = (1 to 20).map(i => s"""<a href="/p$i">link number $i</a>""").mkString(" ")
    val page = s"<html><body><nav>$farm</nav><p>$body</p></body></html>"
    val r = Html.extractMainContent(Seq((1L, page)).toDF("doc_id", "html"))
      .collect().head
    assert(r.getAs[Long]("n_blocks_kept") == 1L)
    assert(r.getAs[String]("main_text") == body)
  }

  test("malformed page with no qualifying block falls back to whole-text strip") {
    val page = "<html><body><div>too short</div><span>also tiny" // unclosed soup
    val r = Html.extractMainContent(Seq((1L, page)).toDF("doc_id", "html"))
      .collect().head
    assert(r.getAs[Int]("used_fallback") == 1)
    assert(r.getAs[Long]("n_blocks_kept") == 0L)
    assert(r.getAs[String]("main_text") == "too short also tiny")
  }

  test("script/style bodies are removed even when text-dense") {
    val page = "<html><body><script>" + ("x".toString * 100) +
      s"</script><p>$body</p></body></html>"
    val r = Html.extractMainContent(Seq((1L, page)).toDF("doc_id", "html"))
      .collect().head
    assert(r.getAs[String]("main_text") == body)
  }
}
