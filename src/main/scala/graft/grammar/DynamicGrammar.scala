package graft.grammar

import org.apache.spark.sql.{DataFrame, functions => F}

/** Dynamic grammar learning — rebuild of the reference's
  * `generate_dynamic_grammar_from_text` (cfg_generator.py:700-745):
  * tag each sentence's words, slide the fixed pattern-template bank
  * (cfg_generator.py:781-808) over the POS sequence, and collect
  * (nonterminal ← pattern) productions; production frequency is the
  * `DynamicGrammarRule.frequency` aggregate (SURVEY.md §2.9 A6 =
  * `groupBy(lhs, rhs).count()`).
  *
  * Tagger: base lexicon + suffix fallback (the reference's NLTK tagger
  * is unavailable on the JVM; the fallback heuristics are the de-facto
  * semantics anyway — SURVEY.md §7.4). Multi-tag lexicon entries
  * resolve by a FIXED priority order (documented below) so tagging is
  * deterministic. NOTE: the reference's `_simplify_pos_tag` has the
  * duplicate dict key 'IN' (cfg_generator.py:763,765) silently
  * remapping prepositions to conjunctions — a listed reference BUG we
  * deliberately do NOT replicate (SURVEY.md §7.4): our lexicon tags
  * prepositions as 'P' directly.
  */
object DynamicGrammar extends Serializable {

  /** Deterministic primary tag for multi-tag lexicon entries. */
  private val tagPriority = Array("DET", "PRP", "AUX", "V", "ADJ", "ADV", "P", "CC", "N")

  def tagWord(word: String): String = {
    val cleaned = Cyk.cleanWord(word)
    Cyk.lexicon.get(cleaned) match {
      case Some(tags) =>
        tagPriority.find(tags.contains).getOrElse(tags.toSeq.sorted.head)
      case None => Cyk.guessPosFallback(cleaned)
    }
  }

  /** Pattern template bank — cfg_generator.py:781-808, verbatim.
    * NOTE: the templates containing the nonterminal "NP" in their
    * pattern (V NP → VP, P NP → PP) can never match — tag sequences
    * contain only terminal POS tags. The REFERENCE has the identical
    * dead templates (its matching also runs over POS tags only,
    * cfg_generator.py:810-820); kept for faithfulness.
    */
  val patterns: Seq[(Seq[String], String)] = Seq(
    // sentence patterns
    Seq("N", "V") -> "S",
    Seq("PRP", "V") -> "S",
    Seq("DET", "N", "V") -> "S",
    Seq("N", "AUX", "ADJ") -> "S",
    // noun phrases
    Seq("DET", "N") -> "NP",
    Seq("DET", "ADJ", "N") -> "NP",
    Seq("ADJ", "N") -> "NP",
    Seq("PRP") -> "NP",
    // verb phrases
    Seq("V") -> "VP",
    Seq("V", "N") -> "VP",
    Seq("V", "NP") -> "VP",
    Seq("AUX", "V") -> "VP",
    Seq("AUX", "ADJ") -> "VP",
    // prepositional phrases
    Seq("P", "N") -> "PP",
    Seq("P", "NP") -> "PP",
    // adjective phrases
    Seq("ADV", "ADJ") -> "ADJP",
    Seq("ADJ") -> "ADJP"
  )

  /** Productions observed in one text: per sentence (first `maxSentences`,
    * cfg_generator.py:708), tag words, match every template at every
    * position; per-sentence dedup matches the reference's per-call
    * dict-of-lists accumulation (cfg_generator.py:817-820 dedups rhs
    * per lhs within a call — here per sentence, the distributed unit).
    */
  def productions(text: String, maxSentences: Int = 50): Seq[(Seq[String], String)] = {
    if (text == null || text.isEmpty) return Nil
    val out = scala.collection.mutable.LinkedHashSet[(Seq[String], String)]()
    Cyk.splitSentences(text).take(maxSentences).foreach { s =>
      val tags = s.split("\\s+").filter(_.nonEmpty).map(tagWord).toSeq
      if (tags.length >= 2) {
        var i = 0
        while (i < tags.length) {
          patterns.foreach { case (pat, rhs) =>
            if (i + pat.length <= tags.length && tags.slice(i, i + pat.length) == pat)
              out += ((pat, rhs))
          }
          i += 1
        }
      }
    }
    out.toSeq
  }

  /** Distributed learning over a corpus: (lhs, rhs, frequency) dim
    * table — explode per-row productions, one groupBy. The result is a
    * broadcast-sized dimension (|template bank| bounds distinct rows).
    *
    * Column convention follows grammar terminology (and the
    * reference's dynamic_grammar dict, cfg_generator.py:817-820):
    * `lhs` = the produced NONTERMINAL, `rhs` = the POS pattern the
    * production expands to (space-joined string, driver-comparable).
    */
  def learn(corpus: DataFrame, textCol: String = "text"): DataFrame = {
    val prodU = F.udf((t: String) => productions(t))
    corpus
      .select(F.explode(prodU(F.col(textCol))).as("p"))
      .groupBy(F.col("p._2").as("lhs"), F.array_join(F.col("p._1"), " ").as("rhs"))
      .agg(F.count(F.lit(1)).as("frequency"))
  }
}
