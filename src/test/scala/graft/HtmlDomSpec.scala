package graft

import graft.sources.{Html, HtmlDom}

/** S4 fixture tests: the DOM-selector extraction must reproduce the
  * reference's category dict (ref `extract_text_fun.py:136-245`) on a
  * TripAdvisor-shaped page — including the selections the old regex pass
  * could not express (class-contains review/comment containers) and the
  * sentence-level duplicate suppression. */
class HtmlDomSpec extends SparkSpec {

  private val fixture =
    """<html><head><title>Sunset Grill - TripAdvisor</title>
      |<style>body {color: red}</style><script>var x = 1; if (x<2) {}</script>
      |<meta charset="utf-8"><link rel="x" href="y">
      |</head>
      |<body>
      |<h1>Sunset &amp; Grill</h1>
      |<p>The menu features fresh seafood and a fine location by the harbor promenade.</p>
      |<p>Review: We visited last summer and the experience was excellent for our family.</p>
      |<p>Rating: 5 stars overall score from 120 visitors this season.</p>
      |<p>short</p>
      |<div class="user-review-block"><span>Visited in June, wonderful experience with the staff.</span><br><span>Would definitely come back for the sunset view.</span></div>
      |<div class="comments"><p>Terrible experience, we stayed one hour and left hungry.</p></div>
      |<div class="info-panel">The location is close to the old town and the harbor; parking available all day.</div>
      |<noscript>enable js</noscript>
      |</body></html>""".stripMargin

  private val seps = Seq("Review:", "Rating:")

  test("DOM: decompose, selectors, entities, raw-text elements") {
    val root = HtmlDom.decompose(HtmlDom.parse(fixture))
    assert(HtmlDom.title(root).contains("Sunset Grill - TripAdvisor"))
    assert(HtmlDom.firstH1(root).contains("Sunset & Grill")) // entity decoded
    // script/style content never leaks into text (script body has a '<')
    assert(!root.text(" ").contains("color: red"))
    assert(!root.text(" ").contains("var x"))
    assert(!root.text(" ").contains("enable js"))
    // class-contains selection: both containers, document order, span+div
    val containers = HtmlDom.findAllByClass(root, Set("div", "span"), "review|comment")
    assert(containers.map(_.classes.head) == Seq("user-review-block", "comments"))
    // p cannot nest: 4 top-level p's + 1 inside the comments div
    assert(HtmlDom.findAll(root, Set("p")).size == 5)
  }

  test("extraction reproduces the reference's category dict on the fixture") {
    val blocks = Html.extractBlocks(fixture, seps)
    def cat(c: String): Seq[String] = blocks.collect { case (`c`, b) => b }
    assert(cat("title") == Seq("Sunset Grill - TripAdvisor"))
    assert(cat("restaurant_info") == Seq("Restaurant Name: Sunset & Grill"))
    assert(cat("reviews") == Seq(
      // p-loop first (document order); the separator is kept glued to the
      // STRIPPED following text (ref `:117`: `separator + part.strip()` —
      // no space survives)
      "Review:We visited last summer and the experience was excellent for our family.",
      // the <p> inside the comments div is found by find_all('p')...
      "Terrible experience, we stayed one hour and left hungry.",
      // ...then the review-class container adds its (non-duplicate) text;
      // the comments container's identical text is dedup-suppressed
      "Visited in June, wonderful experience with the staff. Would definitely come back for the sunset view."))
    assert(cat("ratings") == Seq(
      "Rating:5 stars overall score from 120 visitors this season."))
    assert(cat("descriptions") == Seq(
      "The menu features fresh seafood and a fine location by the harbor promenade."))
    // the plain info div is new text -> other_text; the review/comment
    // divs' texts are already captured and must not reappear
    assert(cat("other_text") == Seq(
      "The location is close to the old town and the harbor; parking available all day."))
  }

  test("sentence-level dedup: quoted/cited sentences are exempt") {
    assert(Html.isQuotedOrCitationStr("""he said it was "great" indeed"""))
    assert(Html.isQuotedOrCitationStr("according to the guide this is fine"))
    // NB the reference substring-searches its markers, so e.g. "unquoted"
    // would trip the "quoted" pattern — pick genuinely plain text
    assert(!Html.isQuotedOrCitationStr("the soup was warm and tasty"))
    // a repeated plain sentence marks the block duplicate...
    assert(Html.hasDuplicateSentence(
      "The staff were friendly and attentive. Something new.",
      Seq("Earlier block: The staff were friendly and attentive.")))
    // ...but not when the new sentence is a quotation
    assert(!Html.hasDuplicateSentence(
      "\"The staff were friendly and attentive.\" Something new.",
      Seq("Earlier block: The staff were friendly and attentive.")))
  }

  test("keyword split keeps the separator with the following text") {
    assert(Html.splitBySeparators(
      "intro words that are long enough Review: body of the first review here Review: second body text",
      Seq("Review:")) == Seq(
      "intro words that are long enough",
      "Review:body of the first review here",
      "Review:second body text"))
  }

  test("raw-text close tag: longer tag names and case don't terminate the region") {
    // </scripty> must NOT close <script>; </SCRIPT > (any case, trailing
    // space) must
    val html = "<html><body><script>var a = '</scripty>' + 1;</SCRIPT ><p>" +
      "visible paragraph text that is long enough to keep</p></body></html>"
    val root = HtmlDom.decompose(HtmlDom.parse(html))
    val text = root.text(" ")
    assert(!text.contains("scripty"), text)
    assert(!text.contains("var a"), text)
    assert(text.contains("visible paragraph text"), text)
  }

  test("categorizedBlocks: distributed (category, pos, block) rows") {
    val s = spark
    import s.implicits._
    val df = Seq(("page1", fixture)).toDF("page", "html")
    val out = Html.categorizedBlocks(df, "html", seps)
    assert(out.columns.toSeq == Seq("page", "pos", "category", "block"))
    val rows = out.collect().map(r => (r.getAs[String]("category"), r.getAs[String]("block")))
    assert(rows.toSeq == Html.extractBlocks(fixture, seps))
    // scalar-function shape: no shuffle exchange in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
