package graft.scrub

import scala.collection.mutable.ArrayBuffer

/** S3 HTML→text extraction — rebuild of the reference's
  * `_extract_content` (web_scraper.py:105-166): strip
  * script/style/nav/footer/header/aside + comments, then the selector
  * cascade `main` / `article` / `[role=main]` / content-class
  * (accepting a selector only when its text exceeds 200 chars) →
  * `body` → all-text, then `_clean_text`, md5 content hash and word
  * count.
  *
  * No HTML parser library ships in the offline image, so this is a
  * from-scratch tolerant tag-soup parser (stack-based, void elements,
  * raw script/style text, comment skipping) — NOT a BeautifulSoup
  * port; it implements the same cascade semantics over a minimal DOM.
  * `getText` mirrors `get_text(separator=' ', strip=True)`: text
  * nodes stripped, empties dropped, joined with single spaces.
  */
object HtmlExtract extends Serializable {

  sealed trait Node
  final case class Elem(
      name: String,
      attrs: Map[String, String],
      children: ArrayBuffer[Node]
  ) extends Node
  final case class Text(s: String) extends Node

  /** Index-preserving ASCII-only lowercase for tag/attr matching and
    * the raw-text close-tag scan. `String.toLowerCase` is
    * locale-sensitive AND length-changing (Turkish default locale:
    * "SCRIPT" → "scrıpt" so element sets never match; U+0130 lowers to
    * TWO chars, desyncing scan indexes from the original document) —
    * HTML tag names are ASCII-case-insensitive by spec, so only A-Z
    * fold (ADVICE r2).
    */
  private def asciiLower(s: String): String = {
    var i = 0
    while (i < s.length && !(s.charAt(i) >= 'A' && s.charAt(i) <= 'Z')) i += 1
    if (i == s.length) return s
    val a = s.toCharArray
    while (i < a.length) {
      val c = a(i)
      if (c >= 'A' && c <= 'Z') a(i) = (c + 32).toChar
      i += 1
    }
    new String(a)
  }

  private val voidElems = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "param", "source", "track", "wbr")
  private val rawTextElems = Set("script", "style")
  private val dropElems = Set("script", "style", "nav", "footer", "header",
    "aside", "sidebar")

  /** Tolerant tag-soup parse into a DOM-lite tree rooted at a
    * synthetic element. Unclosed tags close at EOF; stray close tags
    * pop to the nearest matching ancestor (or are ignored).
    */
  def parse(html: String): Elem = {
    val root = Elem("#root", Map.empty, new ArrayBuffer[Node])
    if (html == null || html.isEmpty) return root
    val stack = scala.collection.mutable.Stack[Elem](root)
    // lowercased once: the raw-text close-tag scan would otherwise
    // re-lowercase the whole document per script/style element
    lazy val lowerHtml = asciiLower(html)
    val n = html.length
    var i = 0
    val text = new java.lang.StringBuilder
    def flushText(): Unit = {
      if (text.length > 0) { stack.top.children += Text(text.toString); text.setLength(0) }
    }
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = html.charAt(i + 1)
        if (c1 == '!' && html.startsWith("<!--", i)) {
          flushText()
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (c1 == '!' || c1 == '?') { // doctype / PI
          flushText()
          val end = html.indexOf('>', i)
          i = if (end < 0) n else end + 1
        } else if (c1 == '/' || Character.isLetter(c1)) {
          flushText()
          val isClose = c1 == '/'
          var j = i + (if (isClose) 2 else 1)
          val nameStart = j
          while (j < n && (Character.isLetterOrDigit(html.charAt(j)) || html.charAt(j) == '-')) j += 1
          val name = asciiLower(html.substring(nameStart, j))
          // attrs until '>'
          val attrEnd = html.indexOf('>', j)
          val rawAttrs = if (attrEnd < 0) html.substring(j) else html.substring(j, attrEnd)
          val selfClose = rawAttrs.endsWith("/")
          i = if (attrEnd < 0) n else attrEnd + 1
          if (isClose) {
            if (stack.exists { case e: Elem => e.name == name }) {
              while (stack.top.name != name) stack.pop()
              if (stack.size > 1) stack.pop()
            } // else: stray close tag, ignored
          } else {
            val elem = Elem(name, parseAttrs(rawAttrs), new ArrayBuffer[Node])
            stack.top.children += elem
            if (rawTextElems.contains(name) && !selfClose) {
              // raw content until the matching close tag
              val close = lowerHtml.indexOf(s"</$name", i)
              val stop = if (close < 0) n else close
              elem.children += Text(html.substring(i, stop))
              val gt = html.indexOf('>', stop)
              i = if (close < 0) n else (if (gt < 0) n else gt + 1)
            } else if (!voidElems.contains(name) && !selfClose) {
              stack.push(elem)
            }
          }
        } else { text.append(c); i += 1 }
      } else { text.append(c); i += 1 }
    }
    flushText()
    root
  }

  private val attrP =
    java.util.regex.Pattern.compile(
      """([a-zA-Z][a-zA-Z0-9_:-]*)\s*(?:=\s*("([^"]*)"|'([^']*)'|[^\s>]*))?""")

  private def parseAttrs(raw: String): Map[String, String] = {
    if (raw.isEmpty) return Map.empty
    val m = attrP.matcher(raw)
    val out = Map.newBuilder[String, String]
    while (m.find()) {
      val v = if (m.group(3) != null) m.group(3)
        else if (m.group(4) != null) m.group(4)
        else Option(m.group(2)).getOrElse("")
      out += asciiLower(m.group(1)) -> v
    }
    out.result()
  }

  /** get_text(separator=' ', strip=True): stripped nonempty text
    * nodes joined with single spaces; dropped elements skipped.
    */
  def getText(node: Node): String = {
    val parts = new ArrayBuffer[String]
    def walk(nd: Node): Unit = nd match {
      case Text(s) => val t = s.strip; if (t.nonEmpty) parts += t
      case e: Elem => if (!dropElems.contains(e.name)) e.children.foreach(walk)
    }
    walk(node)
    parts.mkString(" ")
  }

  /** First element (document order) matching the predicate, skipping
    * dropped elements (they are "decomposed" per web_scraper.py:108).
    */
  def selectFirst(root: Elem, pred: Elem => Boolean): Option[Elem] = {
    def walk(e: Elem): Option[Elem] = {
      if (dropElems.contains(e.name)) return None
      if (e.name != "#root" && pred(e)) return Some(e)
      e.children.iterator.collect { case c: Elem => c }
        .map(walk).collectFirst { case Some(x) => x }
    }
    walk(root)
  }

  private def hasClass(e: Elem, cls: String): Boolean =
    e.attrs.get("class").exists(_.split("\\s+").contains(cls))

  /** The reference's cascade (web_scraper.py:124-148): main-content
    * selectors accepted at >200 chars, else body, else all text.
    */
  private val mainSelectors: Seq[Elem => Boolean] = Seq(
    e => e.name == "main",
    e => e.name == "article",
    e => e.attrs.get("role").contains("main"),
    e => hasClass(e, "main-content"),
    e => hasClass(e, "content"),
    e => hasClass(e, "post-content"),
    e => hasClass(e, "entry-content"),
    e => hasClass(e, "article-content")
  )

  final case class Extracted(
      title: String,
      content: String,
      word_count: Int,
      content_hash: String
  )

  def extract(html: String): Extracted = {
    val root = parse(html)
    val title = selectFirst(root, _.name == "title").map(getText).getOrElse("")
    var content = ""
    // length thresholds in code points (Python len), web_scraper.py:133,137
    def cpLen(s: String) = s.codePointCount(0, s.length)
    val it = mainSelectors.iterator
    while (cpLen(content) <= 200 && it.hasNext) {
      selectFirst(root, it.next()) match {
        case Some(e) => content = getText(e) // accepted only when > 200 chars
        case None => ()
      }
    }
    if (content.isEmpty || cpLen(content) < 200)
      content = selectFirst(root, _.name == "body").map(getText).getOrElse(content)
    if (content.isEmpty) content = getText(root)
    val cleaned = Scrubber.cleanTextReference(content)
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(cleaned.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // table-driven hex: "%02x".format per byte paid a full Formatter
    // allocation 32× per row on the extract hot path
    val hex = new Array[Char](digest.length * 2)
    var hi = 0
    while (hi < digest.length) {
      val b = digest(hi) & 0xff
      hex(hi * 2) = Character.forDigit(b >>> 4, 16)
      hex(hi * 2 + 1) = Character.forDigit(b & 0xf, 16)
      hi += 1
    }
    val hash = new String(hex)
    Extracted(Scrubber.cleanTextReference(title), cleaned,
      if (cleaned.isEmpty) 0 else cleaned.split(" ").count(_.nonEmpty), hash)
  }
}
