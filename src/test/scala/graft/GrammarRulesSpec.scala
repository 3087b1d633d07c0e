package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.grammar.Cyk
import graft.rules.GrammarRules

class GrammarRulesSpec extends AnyFunSuite {

  /** The reference's canonical erroneous paragraph — its de-facto
    * golden fixture (cfg_checker.py:473-480).
    */
  val canonical: String =
    "Natural language processing is a field of artificial intelligence. " +
      "It focus on the interaction between computers and humans. " +
      "NLP helps machine to understand human language. " +
      "The field includes machine translation and sentiment analysis. " +
      "There is many challenges in this field."

  test("canonical paragraph triggers the documented rules (cfg_checker.py:188-192)") {
    val ids = GrammarRules.ruleHits(canonical).map(_.rule_id)
    assert(ids.contains("BASIC_COMMON")) // focus on / machine to understand / includes / there is many
    // all four common-mistake patterns fire somewhere in the text
    val hits = GrammarRules.ruleHits(canonical)
    val snippets = hits.map(_.snippet.toLowerCase)
    assert(snippets.exists(_.contains("focus on")))
    assert(snippets.exists(_.contains("machine to understand")))
    assert(snippets.exists(_.contains("includes")))
    assert(snippets.exists(_.contains("there is many")))
  }

  test("subject-verb patterns, case-insensitive (cfg_checker.py:141-149)") {
    assert(GrammarRules.ruleHits("He ARE going.").exists(_.rule_id == "BASIC_001")
      || GrammarRules.ruleHits("He ARE going.").exists(_.rule_id == "BASIC_SUBJ_VERB"))
    assert(GrammarRules.ruleHits("they is sad.").nonEmpty)
    assert(GrammarRules.ruleHits("I are ok.").nonEmpty)
    assert(GrammarRules.ruleHits("it was they who left.").nonEmpty)
  }

  test("overlap dedup keeps max confidence (cfg_checker.py:317-343): BASIC_001 (0.9) beats BASIC_SUBJ_VERB (0.8)") {
    val hits = GrammarRules.ruleHits("she are here today.")
    val svHits = hits.filter(h => h.rule_id == "BASIC_001" || h.rule_id == "BASIC_SUBJ_VERB")
    assert(svHits.map(_.rule_id) == Seq("BASIC_001"))
    assert(svHits.head.confidence == 0.9)
  }

  test("article patterns are case-SENSITIVE (cfg_checker.py:171)") {
    // '\b(is|was)\s+([A-Z][a-z]+)\b' — requires capitalized noun
    assert(GrammarRules.ruleHits("the result is Amazing stuff.")
      .exists(_.rule_id == "BASIC_ARTICLES"))
    assert(!GrammarRules.ruleHits("the result is amazing stuff.")
      .exists(_.rule_id == "BASIC_ARTICLES"))
    assert(GrammarRules.ruleHits("we went to school quickly.")
      .exists(_.rule_id == "BASIC_ARTICLES"))
  }

  test("double negative (cfg_checker.py:95)") {
    assert(GrammarRules.ruleHits("you don't can't do that.")
      .exists(_.rule_id == "BASIC_002"))
  }

  test("incomplete sentence BASIC_003 runs IGNORECASE via the bank sweep (cfg_checker.py:222)") {
    // matches text with no terminal punctuation, ANY case at start
    assert(GrammarRules.ruleHits("this looks unfinished and lowercase")
      .exists(_.rule_id == "BASIC_003"))
    assert(!GrammarRules.ruleHits("This one is finished.")
      .exists(_.rule_id == "BASIC_003"))
  }

  test("POS bigram: lexicon noun + 'are' flagged; plural-suffix guess not flagged (cfg_checker.py:256-277)") {
    assert(GrammarRules.ruleHits("the dog are big today.")
      .exists(_.rule_id == "POS_SUBJ_VERB"))
    // 'dogs' unknown → suffix fallback tags V (cfg_generator.py:407-421) → not flagged
    assert(!GrammarRules.ruleHits("the dogs are big today.")
      .exists(_.rule_id == "POS_SUBJ_VERB"))
    // pronoun + are is fine
    assert(!GrammarRules.ruleHits("we are big today.")
      .exists(_.rule_id == "POS_SUBJ_VERB"))
  }

  test("hits sorted by start position (cfg_checker.py:312)") {
    val hits = GrammarRules.ruleHits(canonical)
    assert(hits.map(_.start) == hits.map(_.start).sorted)
  }

  test("null / empty safe") {
    assert(GrammarRules.ruleHits(null).isEmpty)
    assert(GrammarRules.ruleHits("").isEmpty)
  }
}

class CykSpec extends AnyFunSuite {

  test("effective grammar: transitive sentence with determiners parses") {
    assert(Cyk.parseSentence("the dog sees the cat").valid)
  }

  test("effective grammar: bare intransitive does NOT parse (Python dict last-wins " +
    "kills the V→VP unary, cfg_generator.py:210 vs :248)") {
    assert(!Cyk.parseSentence("the dog runs").valid)
  }

  test("unknown word gets POS-guessed and can still parse (cfg_generator.py:453-469)") {
    // 'zorblax' → guessed N → (DET,N)→NP → full parse succeeds
    assert(Cyk.parseSentence("the zorblax sees the cat").valid)
  }

  test("unknown-word reason reported when parse fails (cfg_generator.py:491-496)") {
    val r = Cyk.parseSentence("the zorblax quickly")
    assert(!r.valid)
    assert(r.reason.startsWith("Unknown words: zorblax"))
  }

  test("invalid structure reason for known words") {
    val r = Cyk.parseSentence("the the the")
    assert(!r.valid)
    assert(r.reason == "Invalid sentence structure")
  }

  test("word cleaning strips .,!?\"; and lowercases (cfg_generator.py:436)") {
    assert(Cyk.cleanWord("Dog,") == "dog")
    assert(Cyk.cleanWord("\"CAT!\"") == "cat")
  }

  test("lexicon dup-key faithfulness: her→PRP, so→CC (Python last-wins)") {
    assert(Cyk.lexicon("her") == Set("PRP"))
    assert(Cyk.lexicon("so") == Set("CC"))
  }

  test("POS guess inside CYK (cfg_generator.py:454-462)") {
    assert(Cyk.guessPosCyk("quickly", "quickly") == "ADV")
    assert(Cyk.guessPosCyk("jumping", "jumping") == "V")
    assert(Cyk.guessPosCyk("Paris", "paris") == "N")
    assert(Cyk.guessPosCyk("blarg", "blarg") == "N")
  }

  test("sentence split: regex fallback + ≥2 words (cfg_generator.py:332-339)") {
    val s = Cyk.splitSentences("Hello there. One. And another one! Done?")
    assert(s.toSeq == Seq("Hello there", "And another one"))
  }

  test("empty sentence") {
    assert(!Cyk.parseSentence("").valid)
  }
}

class DynamicGrammarSpec extends AnyFunSuite {
  import graft.grammar.DynamicGrammar

  test("productions extracted per the template bank (cfg_generator.py:781-820)") {
    val prods = DynamicGrammar.productions("the dog sees the cat.").toSet
    assert(prods.contains((Seq("DET", "N"), "NP")))
    assert(prods.contains((Seq("V"), "VP")))
    assert(prods.contains((Seq("N", "V"), "S")))
    // "he is happy" → PRP→NP, AUX+ADJ→VP, ADJ→ADJP
    val p2 = DynamicGrammar.productions("he is very happy today.").toSet
    assert(p2.contains((Seq("PRP"), "NP")))
    assert(p2.contains((Seq("ADV", "ADJ"), "ADJP")))
  }

  test("tagger: lexicon priority + fallback; preposition stays P (IN-dup bug NOT replicated)") {
    assert(DynamicGrammar.tagWord("the") == "DET")
    assert(DynamicGrammar.tagWord("in") == "P") // cfg_generator.py:763/765 dup-key bug avoided
    assert(DynamicGrammar.tagWord("be") == "AUX") // multi-tag {V,AUX} → priority
    assert(DynamicGrammar.tagWord("quickly") == "ADV")
    assert(DynamicGrammar.tagWord("zorbly") == "ADV") // fallback -ly
  }

  test("sentence cap honored (cfg_generator.py:708)") {
    val many = (1 to 60).map(i => s"the dog sees the cat number $i").mkString(". ")
    // 50-sentence cap → still finds productions, doesn't blow up
    assert(DynamicGrammar.productions(many, maxSentences = 50).nonEmpty)
  }
}
