package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.scrub.HtmlExtract

/** S3 selector-cascade semantics (web_scraper.py:105-166). */
class HtmlExtractSpec extends AnyFunSuite {

  private val longText =
    (1 to 30).map(i => s"sentence number $i with several words").mkString(". ") + "."

  test("main selector wins when its text exceeds 200 chars; noise elements dropped") {
    val html =
      s"""<html><head><title> My  Page </title>
         |<script>var x = 1 < 2 && "</div>";</script><style>.a{color:red}</style></head>
         |<body><nav>Home | About</nav><!-- a comment -->
         |<header>Big Header</header>
         |<main><p>$longText</p></main>
         |<aside>ads here</aside><footer>Cookie Policy: accept all</footer>
         |</body></html>""".stripMargin
    val e = HtmlExtract.extract(html)
    assert(e.title == "My Page")
    assert(e.content == graft.scrub.Scrubber.cleanTextReference(longText))
    assert(!e.content.contains("Home") && !e.content.contains("Header") &&
      !e.content.contains("ads") && !e.content.contains("Cookie") &&
      !e.content.contains("var x"))
    assert(e.word_count == e.content.split(" ").count(_.nonEmpty))
  }

  test("cascade order: article, [role=main], content classes") {
    val art = s"<html><body><div>x</div><article>$longText</article></body></html>"
    assert(HtmlExtract.extract(art).content.startsWith("sentence number 1"))
    val role = s"""<html><body><div role="main">$longText</div></body></html>"""
    assert(HtmlExtract.extract(role).content.startsWith("sentence number 1"))
    val cls = s"""<html><body><div class="wrap entry-content">$longText</div></body></html>"""
    assert(HtmlExtract.extract(cls).content.startsWith("sentence number 1"))
  }

  test("a short main (<200 chars) falls through to body; no body falls to all text") {
    val shortMain =
      s"""<html><body><main>tiny</main><div>$longText</div></body></html>"""
    val e = HtmlExtract.extract(shortMain)
    assert(e.content.contains("tiny") && e.content.contains("sentence number 1"))
    val noBody = "just bare text, no tags at all"
    assert(HtmlExtract.extract(noBody).content == noBody)
  }

  test("tolerant parsing: unclosed tags, stray close tags, void elements, quoted attrs") {
    val messy =
      """<html><body><p>alpha <b>beta<br><img src="x.png"> gamma</p>
        |</notopen><div class='content over'>delta</div>""".stripMargin
    val e = HtmlExtract.extract(messy)
    Seq("alpha", "beta", "gamma", "delta").foreach(w => assert(e.content.contains(w), w))
  }

  test("property: arbitrary tag-free text wrapped in the page template round-trips through extract") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789.,!?;:'()-"
    (1 to 100).foreach { _ =>
      val t = Seq.fill(60)(
        Seq.fill(1 + rnd.nextInt(9))(alphabet(rnd.nextInt(alphabet.length))).mkString
      ).mkString(" ") // > 200 chars of tag-free words
      val html = s"<html><head><title>x</title></head><body><nav>n</nav>" +
        s"<main><p>$t</p></main><footer>f</footer></body></html>"
      assert(HtmlExtract.extract(html).content ==
        graft.scrub.Scrubber.cleanTextReference(t), t.take(80))
    }
  }

  test("content hash and word count match the cleaned content") {
    val e = HtmlExtract.extract(s"<body><main>$longText</main></body>")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(e.content.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(e.content_hash == md5)
  }

  test("tag matching is locale-independent and index-stable (ADVICE r2: Turkish locale, U+0130)") {
    val prev = java.util.Locale.getDefault
    try {
      // under tr-TR, String.toLowerCase("SCRIPT") == "scrıpt" (dotless
      // ı) — the old code would then fail to drop <SCRIPT> content
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      val e = HtmlExtract.extract(
        s"<BODY><SCRIPT>var SECRET = 1;</SCRIPT><MAIN><P>$longText</P></MAIN></BODY>")
      assert(!e.content.contains("SECRET"))
      assert(e.content.nonEmpty)
      // U+0130 lowercases to TWO chars under any locale — a
      // locale-lowered copy would desync the raw-text close-tag scan
      // indexes; the ASCII fold keeps them aligned
      val tricky = s"<body><main><p>İstanbul $longText</p></main>" +
        "<script>var x = 'İİİ';</script></body>"
      val e2 = HtmlExtract.extract(tricky)
      assert(e2.content.startsWith("İstanbul"))
      assert(!e2.content.contains("var x"))
    } finally java.util.Locale.setDefault(prev)
  }
}
