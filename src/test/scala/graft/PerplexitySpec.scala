package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.lm.NGramLM
import graft.synth.Transcripts

/** Independent perplexity oracle (§2.5, verdict #3): a naive
  * stupid-backoff LM over STRING n-grams (Map-based, no hashing, no
  * open addressing) reimplemented from the published formula — the
  * production NGramLM's hashed-table lookups must reproduce it
  * exactly (64-bit mixed hashes: a collision would show up as a value
  * mismatch here).
  */
object NaiveBackoffLM {
  val LOG_BACKOFF: Double = math.log(0.4)

  def tokens(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val sb = new java.lang.StringBuilder
    text.foreach { c =>
      if (Character.isLetterOrDigit(c) || c == '_') sb.append(Character.toLowerCase(c))
      else if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
    }
    if (sb.length > 0) out += sb.toString
    out.toArray
  }

  final class Model(
      val order: Int,
      val counts: Map[Seq[String], Double],
      val total: Double,
      val vocab: Double
  ) {
    def logProb(toks: Array[String], i: Int): Double = {
      var n = math.min(order, i + 1)
      var backoff = 0.0
      while (n >= 1) {
        val gram = toks.slice(i - n + 1, i + 1).toSeq
        val num = counts.getOrElse(gram, 0.0)
        if (num > 0) {
          val den =
            if (n == 1) total + vocab
            else counts.getOrElse(gram.dropRight(1), 0.0)
          if (den > 0) return backoff + math.log(num / den)
        }
        backoff += LOG_BACKOFF
        n -= 1
      }
      backoff - LOG_BACKOFF + math.log(1.0 / (total + vocab))
    }

    def perplexity(text: String): Double = {
      val toks = tokens(text)
      if (toks.isEmpty) return math.exp(30.0)
      val sum = toks.indices.map(logProb(toks, _)).sum
      math.exp(math.min(30.0, math.max(0.0, -sum / toks.length)))
    }
  }

  def train(texts: Iterable[String], order: Int = 3): Model = {
    val counts = scala.collection.mutable.Map[Seq[String], Double]()
    val vocab = scala.collection.mutable.Set[String]()
    var total = 0.0
    texts.foreach { t =>
      val toks = tokens(t)
      toks.indices.foreach { i =>
        vocab += toks(i)
        total += 1
        var n = 1
        while (n <= order && n <= i + 1) {
          val g = toks.slice(i - n + 1, i + 1).toSeq
          counts(g) = counts.getOrElse(g, 0.0) + 1
          n += 1
        }
      }
    }
    new Model(order, counts.toMap, total, vocab.size.toDouble)
  }
}

class PerplexitySpec extends AnyFunSuite {

  lazy val corpus: Seq[String] = Transcripts.trainingCorpus().map(_._1)
  lazy val hashed: NGramLM = NGramLM.train(corpus)
  lazy val naive: NaiveBackoffLM.Model = NaiveBackoffLM.train(corpus)

  test("hashed-table perplexity == independent string-ngram oracle on training + held-out text") {
    val heldOut = Seq(
      "the quick brown fox jumps over the lazy dog",
      "colorless green ideas sleep furiously every day",
      "zzqx vvbnm qqwert plonk gibberish unseen tokens",
      "the the the the the",
      "he are running to the store and it focus on results",
      "numbers 123 and under_scores mix into tokens",
      "") ++
      Transcripts.trainingCorpus(seed = 123L, perLang = 3).map(_._1)
    // tolerance: the production table stores Float counts (half the
    // memory at 10^8 n-grams) so num/den divides in Float — ~1e-8
    // relative noise; a hash collision would shift a count by ≥1 and
    // blow far past 1e-6
    (corpus.take(30) ++ heldOut).foreach { t =>
      val exp = naive.perplexity(t)
      val got = hashed.perplexity(t)
      assert(math.abs(got - exp) <= 1e-6 * math.max(1.0, exp),
        s"ppl mismatch on '${t.take(60)}': hashed=$got naive=$exp")
    }
  }

  test("perplexity separates in-domain text from gibberish (keep/drop signal)") {
    val inDomain = corpus.take(20).map(naive.perplexity)
    val gibberish = Seq(
      "qzx wvu plk mnb jhg fds rew tyu iop asd",
      "zxcv bnml qwer tyui opas dfgh jklz xcvb")
      .map(naive.perplexity)
    assert(inDomain.max < gibberish.min)
  }
}
