package graft.sources

import scala.collection.mutable.ArrayBuffer

/** Minimal dependency-free HTML DOM: tokenizer + permissive tree builder +
  * the selection/extraction surface the reference's BeautifulSoup pass
  * uses (ref `extract_text_fun.py:136-232`): decompose script/style/meta/
  * link/noscript/iframe, `<title>`, first `<h1>`, `find_all('p')`,
  * `find_all(['div','span'], class_=re.compile('review|comment', I))`,
  * and `get_text(separator, strip)`.
  *
  * Scope is deliberately the subset those selectors need — a permissive
  * stack builder (void elements, raw-text elements, `<p>` auto-close,
  * unmatched close tags ignored), not a full HTML5 tree constructor. No
  * external parser dependency exists in the build, and the per-document
  * parse is embarrassingly parallel — it runs as a deterministic scalar
  * function over the html column.
  */
object HtmlDom {

  final class Node(val tag: String, val attrs: Map[String, String]) {
    val children: ArrayBuffer[AnyRef] = ArrayBuffer.empty // Node | String
    def classes: Seq[String] =
      attrs.getOrElse("class", "").split("\\s+").toSeq.filter(_.nonEmpty)

    /** All descendant elements in document order (self excluded). */
    def descendants: Iterator[Node] = children.iterator.flatMap {
      case n: Node => Iterator.single(n) ++ n.descendants
      case _       => Iterator.empty
    }

    /** BeautifulSoup `get_text(separator, strip=True)`: every descendant
      * text segment stripped, empties dropped, joined by `separator`. */
    def text(separator: String = " "): String = {
      val parts = ArrayBuffer.empty[String]
      def walk(n: Node): Unit = n.children.foreach {
        case s: String =>
          val t = s.trim
          if (t.nonEmpty) parts += t
        case c: Node => walk(c)
      }
      walk(this)
      parts.mkString(separator)
    }
  }

  private val VoidElements = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "param", "source", "track", "wbr")
  private val RawText = Set("script", "style", "noscript", "iframe", "textarea")
  /** BeautifulSoup `decompose()` targets in the reference. */
  private val Decomposed = Set("script", "style", "meta", "link", "noscript", "iframe")

  private def decodeEntities(s: String): String = {
    if (!s.contains('&')) return s
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          val decoded = ent match {
            case "amp"  => Some("&")
            case "lt"   => Some("<")
            case "gt"   => Some(">")
            case "quot" => Some("\"")
            case "apos" => Some("'")
            case "nbsp" => Some(" ")
            case e if e.startsWith("#x") || e.startsWith("#X") =>
              try Some(new String(Character.toChars(Integer.parseInt(e.drop(2), 16))))
              catch { case _: Exception => None }
            case e if e.startsWith("#") =>
              try Some(new String(Character.toChars(e.drop(1).toInt)))
              catch { case _: Exception => None }
            case _ => None
          }
          decoded match {
            case Some(d) => out.append(d); i = semi + 1
            case None    => out.append(c); i += 1
          }
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  private def parseAttrs(s: String): Map[String, String] = {
    val attrs = Map.newBuilder[String, String]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && (s.charAt(i).isWhitespace || s.charAt(i) == '/')) i += 1
      val nameStart = i
      while (i < n && !s.charAt(i).isWhitespace && s.charAt(i) != '=' && s.charAt(i) != '/') i += 1
      val name = s.substring(nameStart, i).toLowerCase
      while (i < n && s.charAt(i).isWhitespace) i += 1
      if (name.nonEmpty) {
        if (i < n && s.charAt(i) == '=') {
          i += 1
          while (i < n && s.charAt(i).isWhitespace) i += 1
          if (i < n && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
            val q = s.charAt(i); i += 1
            val vStart = i
            while (i < n && s.charAt(i) != q) i += 1
            attrs += name -> decodeEntities(s.substring(vStart, i))
            if (i < n) i += 1
          } else {
            val vStart = i
            while (i < n && !s.charAt(i).isWhitespace) i += 1
            attrs += name -> decodeEntities(s.substring(vStart, i))
          }
        } else attrs += name -> ""
      }
    }
    attrs.result()
  }

  /** Parse to a synthetic root node. Never throws on malformed input —
    * a permissive parser is part of the contract (scraped HTML is dirty). */
  def parse(html: String): Node = {
    val root = new Node("#root", Map.empty)
    var stack = List(root)
    def top = stack.head
    val n = html.length
    var i = 0
    var textStart = 0
    def flushText(until: Int): Unit =
      if (until > textStart) top.children += decodeEntities(html.substring(textStart, until))
    while (i < n) {
      if (html.charAt(i) == '<' && i + 1 < n) {
        val c1 = html.charAt(i + 1)
        if (html.startsWith("<!--", i)) {
          flushText(i)
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
          textStart = i
        } else if (c1 == '!' || c1 == '?') {
          flushText(i)
          val end = html.indexOf('>', i + 1)
          i = if (end < 0) n else end + 1
          textStart = i
        } else if (c1 == '/') {
          flushText(i)
          val end = html.indexOf('>', i + 2)
          val name = html.substring(i + 2, if (end < 0) n else end).trim.toLowerCase
          // pop to nearest matching open element; ignore unmatched closes
          if (stack.exists(_.tag == name))
            while (stack.head.tag != name) stack = stack.tail
          if (stack.head.tag == name && stack.tail.nonEmpty) stack = stack.tail
          i = if (end < 0) n else end + 1
          textStart = i
        } else if (c1.isLetter) {
          flushText(i)
          val end = html.indexOf('>', i + 1)
          val inner = html.substring(i + 1, if (end < 0) n else end)
          val selfClosed = inner.endsWith("/")
          val body = if (selfClosed) inner.dropRight(1) else inner
          var nameEnd = 0
          while (nameEnd < body.length && !body.charAt(nameEnd).isWhitespace) nameEnd += 1
          val name = body.substring(0, nameEnd).toLowerCase
          val node = new Node(name, parseAttrs(body.substring(nameEnd)))
          // <p> cannot nest: an open <p> is implicitly closed (HTML5 rule
          // the reference's extraction depends on for sibling paragraphs)
          if (name == "p" && stack.exists(_.tag == "p")) {
            while (stack.head.tag != "p") stack = stack.tail
            if (stack.tail.nonEmpty) stack = stack.tail
          }
          top.children += node
          i = if (end < 0) n else end + 1
          if (RawText(name) && !selfClosed) {
            // raw-text content: everything until the matching close tag
            val closeAt = findCloseTag(html, name, i)
            val stop = if (closeAt < 0) n else closeAt
            node.children += html.substring(i, stop)
            val gt = html.indexOf('>', stop)
            i = if (closeAt < 0) n else (if (gt < 0) n else gt + 1)
          } else if (!selfClosed && !VoidElements(name)) {
            stack = node :: stack
          }
          textStart = i
        } else { i += 1 }
      } else i += 1
    }
    flushText(n)
    root
  }

  /** Case-insensitive scan for `</name` whose tag name ends there (next
    * char is '>', whitespace, or '/') — `</scripty>` must not terminate a
    * script region, and no per-element whole-document lowercase copy. */
  private def findCloseTag(html: String, name: String, from: Int): Int = {
    val n = html.length
    val target = "</" + name
    val tl = target.length
    var j = from
    while (j >= 0 && j < n) {
      j = html.indexOf('<', j)
      if (j < 0) return -1
      if (j + tl <= n && html.regionMatches(true, j, target, 0, tl)) {
        val after = j + tl
        if (after >= n || html.charAt(after) == '>' ||
            html.charAt(after) == '/' || html.charAt(after).isWhitespace)
          return j
      }
      j += 1
    }
    -1
  }

  /** The reference's pre-pass: drop non-visible elements entirely. */
  def decompose(root: Node): Node = {
    def strip(n: Node): Unit = {
      val kept = n.children.filter {
        case c: Node => !Decomposed(c.tag)
        case _       => true
      }
      n.children.clear()
      n.children ++= kept
      n.children.foreach { case c: Node => strip(c); case _ => () }
    }
    strip(root)
    root
  }

  /** `find_all(tags)` in document order. */
  def findAll(root: Node, tags: Set[String]): Seq[Node] =
    root.descendants.filter(n => tags(n.tag)).toSeq

  /** `find_all(tags, class_=re.compile(pattern, I))`: the regex is searched
    * against each individual class token, BeautifulSoup-style. */
  def findAllByClass(root: Node, tags: Set[String], pattern: String): Seq[Node] = {
    val re = ("(?i)" + pattern).r
    root.descendants.filter(n =>
      tags(n.tag) && n.classes.exists(c => re.findFirstIn(c).isDefined)).toSeq
  }

  def title(root: Node): Option[String] =
    findAll(root, Set("title")).headOption.map(_.text(" "))

  def firstH1(root: Node): Option[String] =
    findAll(root, Set("h1")).headOption.map(_.text(" "))
}
