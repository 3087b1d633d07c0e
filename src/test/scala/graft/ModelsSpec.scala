package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.langid.LangId
import graft.lm.{LongFloatMap, NGramLM}
import graft.synth.Transcripts

class LangIdSpec extends AnyFunSuite {

  lazy val model = graft.pipeline.Curate.defaultModels.langId

  test("per-language F1 ≥ 0.99 on held-out synth clean text (SURVEY.md §2.4 gate)") {
    // held-out: different seed than the training corpus (seed=7)
    val held = Transcripts.trainingCorpus(seed = 1234L, perLang = 200)
    val results = held.map { case (text, lang) => (lang, model.predict(text)._1) }
    Transcripts.langs.foreach { lang =>
      val tp = results.count { case (t, p) => t == lang && p == lang }.toDouble
      val fp = results.count { case (t, p) => t != lang && p == lang }.toDouble
      val fn = results.count { case (t, p) => t == lang && p != lang }.toDouble
      val f1 = 2 * tp / (2 * tp + fp + fn)
      assert(f1 >= 0.99, s"lang $lang F1=$f1")
    }
  }

  test("letter-free text → und with zero confidence") {
    assert(model.predict("123 456 789 012 345") == ("und", 0.0))
    assert(model.predict("!!! ... 42") == ("und", 0.0))
    assert(model.predict("") == ("und", 0.0))
    assert(model.predict(null) == ("und", 0.0))
  }

  test("confident on clean text") {
    val (lang, conf) = model.predict("Nous avons une réponse très rapide pour chaque question.")
    assert(lang == "fr")
    // NB softmax over per-gram-averaged logprobs is conservative; well
    // above the 0.25 decision threshold is what the pipeline needs
    assert(conf > 0.8)
  }

  test("prediction deterministic and independent of trailing content beyond cap") {
    val base = "the data pipeline runs with careful checks " * 30 // > maxChars
    assert(model.predict(base) == model.predict(base + " zzz extra"))
  }

  test("training is deterministic") {
    val c = Transcripts.trainingCorpus(seed = 5L, perLang = 50)
    val m1 = LangId.train(c)
    val m2 = LangId.train(c)
    assert(java.util.Arrays.equals(m1.weights, m2.weights))
  }
}

class NGramLMSpec extends AnyFunSuite {

  lazy val lm = graft.pipeline.Curate.defaultModels.lm

  test("clean synth text scores far below the ppl cap; gibberish far above") {
    val clean = Transcripts.trainingCorpus(seed = 777L, perLang = 50)
    val cap = graft.rules.QualityRules.defaultConfig.maxPpl
    clean.foreach { case (text, lang) =>
      val p = lm.perplexity(text)
      assert(p < cap, s"clean $lang text ppl=$p: '$text'")
    }
    val gib = Seq("xqzt vprw khjl zzyx wqpt nmbv",
      "blorf quix zandar weebly fnord glomp krell")
    gib.foreach { g =>
      assert(lm.perplexity(g) > cap, s"gibberish ppl=${lm.perplexity(g)}")
    }
  }

  test("empty text → max perplexity") {
    assert(lm.perplexity("") == NGramLM.PPL_MAX)
    assert(lm.perplexity(null) == NGramLM.PPL_MAX)
  }

  test("perplexity deterministic") {
    val t = "we process the data with careful checks."
    assert(lm.perplexity(t) == lm.perplexity(t))
  }

  test("LongFloatMap put/get/addTo/grow") {
    val m = new LongFloatMap(4)
    (1L to 1000L).foreach(k => m.put(k, k.toFloat))
    (1L to 1000L).foreach(k => assert(m.get(k, -1f) == k.toFloat))
    assert(m.get(5555L, -1f) == -1f)
    m.addTo(7L, 3f)
    assert(m.get(7L, 0f) == 10f)
    assert(m.size == 1000)
    // reserved key 0 remap works
    m.put(0L, 42f)
    assert(m.get(0L, -1f) == 42f)
  }
}
