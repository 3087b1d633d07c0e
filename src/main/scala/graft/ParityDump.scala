package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.grammar.Cyk
import graft.rules.GrammarRules
import graft.synth.Transcripts

/** Reference-parity dump (no Spark needed): evaluates this engine's
  * grammar-rule hits (regex subset, POS excluded — the reference's POS
  * path is NLTK-only) and CYK parses over a fixed corpus, as JSON.
  * `scripts/reference_parity.py` runs the REFERENCE's own Python
  * implementation (cfg_checker._apply_basic_rules/_apply_cfg_rules/
  * _deduplicate_errors; cfg_generator.parse_sentence_cyk) on the same
  * corpus and asserts exact agreement — true reference-results parity,
  * not a self-defined oracle.
  */
object ParityDump {

  val texts: Seq[String] = {
    val canonical =
      "Natural language processing is a field of artificial intelligence. " +
        "It focus on the interaction between computers and humans. " +
        "NLP helps machine to understand human language. " +
        "The field includes machine translation and sentiment analysis. " +
        "There is many challenges in this field."
    val traps = Seq(
      "he are running to the store.",
      "He ARE running to the store.",
      "they is happy and we was there yesterday.",
      "I are certain about this.",
      "it was they who left early.",
      "the result is Amazing stuff indeed.",
      "the result is amazing stuff indeed.",
      "we went to school quickly today.",
      "We went to School quickly today.",
      "you don't can't do that thing.",
      "this looks unfinished and lowercase",
      "This Is All Capitalized Words Here",
      "There is many reasons. And it focus on results. NLP includes parsing.",
      "she are here. he are there. it are everywhere.",
      "the machine to understand text includes many parts.",
      "was we there? was you there? was they there?",
      "focus on the plan. Focus On the goal. FOCUS ON it.",
      "includes Capitalized does not fire lookahead",
      "includes lowercase does fire the lookahead",
      "nothing wrong with this perfectly ordinary sentence.",
      "", "   ", "a", "是的 我们 都 同意。",
      // supplementary chars before a hit: context window + positions
      // must be CODE POINTS to match Python slicing
      "🎉🎉🎉 party text and then he are happy after the emoji run.",
      ("🎉" * 60) + " padding words here so the window clips. he are late.",
      // NEL (U+0085) is whitespace to Python str.strip/split
      "intro\u0085line break.\u0085he are here."
    )
    val synth = Transcripts.trainingCorpus(seed = 99L, perLang = 8).map(_._1)
    (canonical +: traps) ++ synth
  }

  val sentences: Seq[String] = Seq(
    "the dog sees the cat",
    "the dog runs",
    "the teacher is good",
    "he is happy",
    "the zorblax sees the cat",
    "the zorblax quickly",
    "the the the",
    "dog",
    "the big dog eats the small cat",
    "a woman gives the child the book",
    "I see the dog and the cat",
    "the dog quickly eats food",
    "every student knows the answer",
    "The Dog Sees The Cat",
    "the dog, sees the cat!",
    "colorless green ideas sleep furiously",
    "the computer runs the program on the table",
    "she eats",
    "we are happy",
    "this is a very beautiful house"
  )

  private def jstr(s: String) =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Messy inputs for _clean_text / chunk_text parity (multiline,
    * noise lines, PII, repeated punctuation, long sentence streams).
    */
  val cleanInputs: Seq[String] = Seq(
    "Hello   world.\n\nCookie Policy: accept all\nreal content stays here.",
    "Read this!! Or this??? Or even this.....",
    "mail me at a@b.co or visit https://x.io/page?z=1 now",
    "Subscribe to our weekly newsletter today\nMore text after.",
    "Follow us on everything\tand ever after",
    "Privacy Policy stuff Terms of Service stuff Share this stuff",
    "  leading and trailing   \n spaces  ",
    "no noise at all, just words."
  ) ++ texts.take(10)

  val chunkInputs: Seq[(String, Int, Int)] = {
    val long1 = (1 to 40).map(i => s"Sentence number $i has several words in it.").mkString(" ")
    val long2 = (1 to 25).map(i => s"Short one $i!").mkString(" ") + " trailing tail without punct"
    val long3 = ("x" * 120) + ". " + ("y" * 80) + "! " + ("z" * 200) + "?"
    Seq((long1, 120, 30), (long1, 500, 50), (long2, 80, 20), (long3, 100, 25),
      ("tiny text.", 500, 50), ("", 500, 50),
      // ADVICE regressions: a trailing unpunctuated fragment that is a
      // substring of an earlier sentence must pass through verbatim
      // (text_chunker.py:74 index guard)...
      ("The cat sat. The cat", 10, 3),
      ("abc def. abc", 8, 3),
      // ...Unicode whitespace (NBSP) splits/strips like Python...
      ("Hello.\u00a0World again.\u00a0And more text here. Tail bit", 20, 8),
      ("alpha beta.\u2003gamma delta here. epsilon zeta theta.\u00a0", 24, 10),
      // ...and lengths are code points (supplementary chars)
      ("🎉🎉 alpha beta. 🎉 gamma delta. epsilon zeta final words. tail", 25, 8))
  }

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/parity_scala.json"
    val textsJson = texts.map { t =>
      val hits = GrammarRules.ruleHits(t, includePos = false).map { h =>
        // engine offsets are UTF-16; Python's are code points — convert
        // at the dump layer (same semantic position, different unit)
        val (cs, ce) = (t.codePointCount(0, h.start), t.codePointCount(0, h.end))
        s"""{"rule_id": ${jstr(h.rule_id)}, "start": $cs, "end": $ce, "snippet": ${jstr(h.snippet)}, "confidence": ${h.confidence}, "context": ${jstr(h.context)}}"""
      }.mkString("[", ", ", "]")
      s"""{"text": ${jstr(t)}, "hits": $hits}"""
    }.mkString("[", ",\n", "]")
    val cleanJson = cleanInputs.map { t =>
      s"""{"text": ${jstr(t)}, "cleaned": ${jstr(graft.scrub.Scrubber.cleanTextReference(t))}}"""
    }.mkString("[", ",\n", "]")
    val chunkJson = chunkInputs.map { case (t, size, ov) =>
      val cs = graft.chunk.Chunker.chunkText(t, size, ov).map(jstr).mkString("[", ", ", "]")
      s"""{"text": ${jstr(t)}, "size": $size, "overlap": $ov, "chunks": $cs}"""
    }.mkString("[", ",\n", "]")
    val sentJson = sentences.map { s =>
      val r = Cyk.parseSentence(s)
      s"""{"sentence": ${jstr(s)}, "valid": ${r.valid}, "reason": ${jstr(r.reason)}}"""
    }.mkString("[", ",\n", "]")
    val json =
      s"""{"texts": $textsJson, "sentences": $sentJson, "clean": $cleanJson, "chunk": $chunkJson}"""
    Files.write(Paths.get(out), json.getBytes(StandardCharsets.UTF_8))
    println(s"wrote $out (${texts.size} texts, ${sentences.size} sentences, " +
      s"${cleanInputs.size} clean, ${chunkInputs.size} chunk)")
  }
}
